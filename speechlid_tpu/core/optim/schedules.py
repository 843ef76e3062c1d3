"""LR schedules (reference: ccml/optim/tri_state.py,
ccml/optim/cosine_annealing_warmup.py, and torch ReduceLROnPlateau used in
the trainer's epoch mode, ccml/trainer.py:620-634).

TriStage / cosine-restarts are pure ``step → lr`` functions usable directly
as optax schedules inside the jitted step.  ReduceLROnPlateau is inherently
host-driven (depends on eval metrics), so it is a small host class whose
current lr is injected via ``optax.inject_hyperparams`` — see
core/optim/factory.py.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import optax


def tristage_schedule(
    lr: float = 1e-4,
    warmup_steps: int = 0,
    hold_steps: int = 0,
    decay_steps: int = 0,
    phase_ratio: Optional[Tuple[float, float, float]] = None,
    max_update: int = 1000,
    init_lr_scale: float = 0.01,
    final_lr_scale: float = 0.01,
) -> optax.Schedule:
    """SpecAugment-paper tri-stage schedule (tri_state.py:6-116):
    linear warmup init→peak, hold, exponential decay to final, then flat."""
    if phase_ratio is not None:
        assert abs(sum(phase_ratio) - 1.0) < 1e-6, "phase ratios must sum to 1"
        warmup_steps = int(max_update * phase_ratio[0])
        hold_steps = int(max_update * phase_ratio[1])
        decay_steps = int(max_update * phase_ratio[2])
    assert warmup_steps + hold_steps + decay_steps > 0
    init_lr = init_lr_scale * lr
    final_lr = final_lr_scale * lr
    warmup_rate = (lr - init_lr) / warmup_steps if warmup_steps else 0.0
    decay_factor = -math.log(final_lr_scale) / decay_steps if decay_steps else 0.0

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        w, h, d = float(warmup_steps), float(hold_steps), float(decay_steps)
        warm = init_lr + warmup_rate * step
        hold = jnp.float32(lr)
        decay = lr * jnp.exp(-decay_factor * (step - w - h))
        flat = jnp.float32(final_lr)
        return jnp.where(
            step < w,
            warm,
            jnp.where(step < w + h, hold, jnp.where(step <= w + h + d, decay, flat)),
        )

    return schedule


def cosine_annealing_warmup_restarts(
    first_cycle_steps: int,
    cycle_mult: float = 1.0,
    max_lr: float = 0.1,
    min_lr: float = 0.001,
    warmup_steps: int = 0,
    gamma: float = 1.0,
) -> optax.Schedule:
    """katsura-jp cosine-annealing-with-warmup-restarts
    (cosine_annealing_warmup.py:6-89): per cycle, linear warmup min→max then
    cosine to min; cycle length × cycle_mult, peak × gamma each restart.

    With cycle_mult != 1 the cycle index needs a log — computed in f32 inside
    jit (same closed form as the reference's host float math).
    """
    assert warmup_steps < first_cycle_steps

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if cycle_mult == 1.0:
            cycle = jnp.floor(step / first_cycle_steps)
            step_in_cycle = step - cycle * first_cycle_steps
            cur_cycle_steps = jnp.float32(first_cycle_steps)
        else:
            n = jnp.floor(
                jnp.log(
                    step / first_cycle_steps * (cycle_mult - 1.0) + 1.0
                ) / math.log(cycle_mult)
            )
            start = first_cycle_steps * (cycle_mult**n - 1.0) / (cycle_mult - 1.0)
            cycle = n
            step_in_cycle = step - start
            cur_cycle_steps = first_cycle_steps * cycle_mult**n
        cur_max = min_lr + (max_lr - min_lr) * gamma**cycle
        warm = min_lr + (cur_max - min_lr) * step_in_cycle / warmup_steps \
            if warmup_steps else jnp.float32(min_lr)
        cos = min_lr + 0.5 * (cur_max - min_lr) * (
            1.0 + jnp.cos(
                jnp.pi * (step_in_cycle - warmup_steps)
                / (cur_cycle_steps - warmup_steps)
            )
        )
        return jnp.where(step_in_cycle < warmup_steps, warm, cos)

    return schedule


class ReduceLROnPlateau:
    """Host-side plateau scheduler (torch semantics, used by the reference
    trainer's epoch lr mode on the eval moving-avg loss,
    ccml/trainer.py:620-634)."""

    def __init__(
        self,
        lr: float,
        mode: str = "min",
        factor: float = 0.1,
        patience: int = 10,
        threshold: float = 1e-4,
        min_lr: float = 0.0,
        cooldown: int = 0,
    ):
        self.lr = lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.cooldown = cooldown
        self.best: Optional[float] = None
        self.num_bad = 0
        self.cooldown_counter = 0

    def _is_better(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return metric < self.best * (1.0 - self.threshold)
        return metric > self.best * (1.0 + self.threshold)

    def step(self, metric: float) -> float:
        """Feed an epoch metric; returns the (possibly reduced) current lr."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.cooldown_counter = self.cooldown
                self.num_bad = 0
        return self.lr

    def state_dict(self) -> dict:
        return {
            "lr": self.lr, "best": self.best, "num_bad": self.num_bad,
            "cooldown_counter": self.cooldown_counter,
        }

    def load_state_dict(self, d: dict) -> None:
        self.lr = d["lr"]
        self.best = d["best"]
        self.num_bad = d["num_bad"]
        self.cooldown_counter = d["cooldown_counter"]

"""Optimizer factory: name + config → optax chain with clipping & schedule.

Mirrors the reference agents' ``config_optim`` patterns
(lid/LidModule_ASR.py:140-172: Adam or Novograd + TriStage/cosine/plateau,
grad-clip 20 applied by the trainer at ccml/trainer.py:541).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import optax

from speechlid_tpu.core.optim.novograd import novograd
from speechlid_tpu.core.optim.schedules import (
    ReduceLROnPlateau,
    cosine_annealing_warmup_restarts,
    tristage_schedule,
)


def make_optimizer(
    name: str = "adam",
    lr: float = 1e-3,
    weight_decay: float = 0.0,
    clip_norm: Optional[float] = 20.0,
    schedule: Optional[str] = None,
    schedule_conf: Optional[Dict[str, Any]] = None,
    optim_conf: Optional[Dict[str, Any]] = None,
    routed: bool = False,
) -> Tuple[optax.GradientTransformation, Optional[ReduceLROnPlateau]]:
    """Returns (tx, plateau_or_None).

    schedule: None | 'tristage' | 'cosine' | 'plateau'.  For 'plateau' the
    lr is exposed as an injectable hyperparam (host updates
    ``opt_state.hyperparams['learning_rate']`` after each eval epoch).

    routed=True (adam only): routing-aware Adam
    (core/optim/routed.routed_adam) whose moments and per-row step counts
    freeze wherever the step's mask is 0 — exact torch grad=None-skip
    semantics for hard-routed expert heads and freeze schedules.  The
    trainer feeds the mask via ``tx.update(..., mask=…)``.
    """
    lr = float(lr)  # guard against YAML "2e-3"-style string floats
    schedule_conf = dict(schedule_conf or {})
    optim_conf = dict(optim_conf or {})
    plateau = None

    if routed:
        from speechlid_tpu.core.optim.routed import routed_adam

        if name != "adam":
            raise ValueError("routed mode currently supports adam only")
        if weight_decay:
            raise ValueError("routed adam does not take weight_decay")
        if schedule == "plateau":
            # plateau injects lr by mutating opt_state hyperparams — the
            # routed transform keeps lr out of its state; fall back to the
            # plain chain for that combination
            raise ValueError("routed adam does not support plateau lr")
        if schedule == "tristage":
            lr_fn = tristage_schedule(lr=lr, **schedule_conf)
        elif schedule == "cosine":
            schedule_conf.setdefault("max_lr", lr)
            lr_fn = cosine_annealing_warmup_restarts(**schedule_conf)
        else:
            lr_fn = lr
        return (
            routed_adam(lr_fn, clip_norm=clip_norm, **optim_conf),
            None,
        )

    if schedule == "tristage":
        lr_or_sched = tristage_schedule(lr=lr, **schedule_conf)
    elif schedule == "cosine":
        schedule_conf.setdefault("max_lr", lr)
        lr_or_sched = cosine_annealing_warmup_restarts(**schedule_conf)
    elif schedule == "plateau":
        plateau = ReduceLROnPlateau(lr=lr, **schedule_conf)
        lr_or_sched = lr
    else:
        lr_or_sched = lr

    def core(learning_rate):
        if name == "adam":
            return optax.adam(learning_rate, **optim_conf)
        if name == "adamw":
            return optax.adamw(
                learning_rate, weight_decay=weight_decay, **optim_conf
            )
        if name == "sgd":
            return optax.sgd(learning_rate, **optim_conf)
        if name == "novograd":
            return novograd(
                learning_rate, weight_decay=weight_decay, **optim_conf
            )
        raise ValueError(f"unknown optimizer: {name}")

    if plateau is not None:
        inner = optax.inject_hyperparams(
            lambda learning_rate: core(learning_rate)
        )(learning_rate=lr)
    else:
        inner = core(lr_or_sched)

    chain = []
    if clip_norm:
        chain.append(optax.clip_by_global_norm(clip_norm))
    if name == "adam" and weight_decay:
        # torch Adam's weight_decay is L2 added to the grad INSIDE
        # optimizer.step — i.e. AFTER the trainer-level clip (the
        # reference clips raw grads at ccml/trainer.py:541), and it
        # applies regardless of the LR schedule (plateau included)
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(inner)
    return optax.chain(*chain), plateau

"""TaskModule — the user contract (reference: ccml/ccml_module.py CCMLModule).

A task binds model + loss + metrics + optimizer.  Unlike the torch original
(mutable nn.Module with train_loop/val_loop methods called per batch), the
TPU contract splits into:

- **pure device fns** (``train_loop`` / ``val_loop`` / ``test_loop``):
  ``(variables, batch, rngs) → (loss, metrics, mutated_collections)`` —
  traced ONCE by the Trainer into jitted steps; no python side effects.
- **host hooks** (``*_loop_end``, ``before_train_loop``): run on
  materialized numpy metric dicts at epoch boundaries — this is where
  streaming metrics (EER/CAvg/CER) accumulate and freeze schedules change.

Hyperparameters passed to ``save_hyper_parameters`` are stored in every
checkpoint so ``resume_from_checkpoint`` can re-instantiate the module
(reference ccml_module.py:150-171).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Tuple

import flax.linen as nn
import jax
import optax


class TaskModule:
    # PRNG stream names the train step must provide (e.g. dropout/specaug)
    rng_keys: Tuple[str, ...] = ("dropout",)

    def __init__(self) -> None:
        self.hyper_parameters: Dict[str, Any] = {}
        self.trainer = None  # set by Trainer

    def save_hyper_parameters(self, ignore: Iterable[str] = (), **kwargs) -> None:
        self.hyper_parameters = {
            k: v for k, v in kwargs.items() if k not in set(ignore)
        }

    # ------------------------------------------------------------------ model
    def build_model(self) -> nn.Module:
        raise NotImplementedError

    def init_variables(self, rng: jax.Array, sample_batch: Any) -> Dict:
        """Initialize model variables from one (host) sample batch."""
        raise NotImplementedError

    def config_optim(self) -> Tuple[optax.GradientTransformation, Any]:
        """→ (tx, plateau_scheduler_or_None) (reference config_optim,
        ccml_module.py:87)."""
        raise NotImplementedError

    # ----------------------------------------------------------- device loops
    def train_loop(
        self, variables: Dict, batch: Any, rngs: Dict[str, jax.Array]
    ) -> Tuple[jax.Array, Dict[str, jax.Array], Dict]:
        """→ (loss, metric dict, mutated collections e.g. batch_stats)."""
        raise NotImplementedError

    def val_loop(self, variables: Dict, batch: Any) -> Dict[str, jax.Array]:
        raise NotImplementedError

    def test_loop(self, variables: Dict, batch: Any) -> Dict[str, jax.Array]:
        return self.val_loop(variables, batch)

    # ------------------------------------------------------------- host hooks
    def before_train_loop(self, epoch: int) -> Optional[Any]:
        """Return a new trainable-mask pytree (1.0/0.0 per leaf) to change
        which params train this epoch — the stop-gradient analog of the
        reference's freeze schedules (lid/LidModule_ASR.py:279-304) — or
        None to keep the current mask."""
        return None

    def train_loop_end(self, outputs: List[Dict]) -> Dict[str, float]:
        """Aggregate per-step host metric dicts → epoch metrics."""
        import numpy as np

        agg: Dict[str, float] = {}
        if outputs:
            keys = outputs[0].keys()
            for k in keys:
                vals = [
                    o[k] for o in outputs
                    if k in o and np.isscalar(o[k]) and np.isfinite(o[k])
                ]
                if vals:
                    agg[f"avg_train_{k}"] = float(np.mean(vals))
        return agg

    def val_loop_end(self, outputs: List[Dict]) -> Dict[str, float]:
        import numpy as np

        agg: Dict[str, float] = {}
        if outputs:
            for k in outputs[0].keys():
                vals = [
                    o[k] for o in outputs
                    if k in o and np.isscalar(o[k]) and np.isfinite(o[k])
                ]
                if vals:
                    agg[f"avg_val_{k}"] = float(np.mean(vals))
        return agg

    def test_loop_end(self, outputs: List[Dict]) -> Dict[str, float]:
        return self.val_loop_end(outputs)

    # ------------------------------------------------------------- resumption
    @classmethod
    def resume_from_checkpoint(cls, ckpt_path: str, **override):
        """Re-instantiate from saved hyper_parameters then load weights
        (reference classmethod, ccml_module.py:150-171).  Returns
        (module, checkpoint_payload)."""
        from speechlid_tpu.core.checkpoint import load_checkpoint

        payload = load_checkpoint(ckpt_path)
        hparams = dict(payload["meta"].get("hyper_parameters", {}))
        hparams.update(override)
        module = cls(**hparams)
        return module, payload

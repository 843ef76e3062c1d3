"""Immutable training state pytree.

The reference Trainer mutates model/optimizer/scaler in place
(ccml/trainer.py); the TPU-native equivalent is a single donated pytree
threaded through a jitted step: params, mutable model collections
(batch_stats), optimizer state, step counter, PRNG key, and the optional
SWA average (reference SWA: trainer.py:419-425,574-580).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    model_state: Any  # e.g. {"batch_stats": ...}; empty dict if none
    opt_state: Any
    rng: jax.Array
    # stochastic weight averaging (None → disabled)
    swa_params: Optional[Any] = None
    swa_count: Optional[jax.Array] = None

    @classmethod
    def create(cls, params, model_state, opt_state, rng, swa: bool = False):
        return cls(
            step=jnp.zeros([], jnp.int32),
            params=params,
            model_state=model_state,
            opt_state=opt_state,
            rng=rng,
            swa_params=jax.tree_util.tree_map(jnp.copy, params) if swa else None,
            swa_count=jnp.zeros([], jnp.int32) if swa else None,
        )

    def variables(self, params=None) -> dict:
        v = {"params": self.params if params is None else params}
        v.update(self.model_state or {})
        return v

    def swa_update(self) -> "TrainState":
        """EMA-free running average: avg += (p - avg)/(n+1)
        (torch AveragedModel default)."""
        n = self.swa_count.astype(jnp.float32)
        new_avg = jax.tree_util.tree_map(
            lambda a, p: a + (p - a) / (n + 1.0), self.swa_params, self.params
        )
        return self.replace(swa_params=new_avg, swa_count=self.swa_count + 1)

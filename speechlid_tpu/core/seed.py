"""Deterministic seeding (reference: ccml/train_helper.py:6 seed_everything).

The reference seeds python/numpy/torch + cudnn-deterministic. On TPU the
device RNG is carried explicitly as a jax.random key inside TrainState, so
host-side seeding only needs python/numpy (manifest shuffling, samplers)
plus producing the root JAX key.
"""

from __future__ import annotations

import os
import random

import numpy as np
import jax


def seed_everything(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNG key.

    Unlike the torch original there is no global device RNG to pin —
    determinism on TPU comes from threading the returned key through the
    jitted step functions.
    """
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)

"""Novograd optimizer as an optax GradientTransformation.

Rebuild of the reference's NVIDIA Novograd port (ccml/optim/novograd.py:30-146,
"Stochastic Gradient Methods with Layer-wise Adaptive Moments",
arxiv 1905.11286): per-*layer* (per-leaf) scalar second moment of the
gradient norm, per-element first moment, optional decoupled-style L2 after
normalization, grad averaging, and LUC trust-ratio clipping.

Faithful semantics notes:
- the second moment is initialized to the first step's ||g||² (not 0-debias),
  matching novograd.py:115-118;
- weight decay is added AFTER normalization (novograd.py:131-132);
- LUC: update scale = min(luc_trust·||p|| / (||m||+eps), lr) (novograd.py:137-143).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


class NovogradState(NamedTuple):
    count: chex.Array  # scalar int32
    mu: optax.Updates  # first moment, like params
    nu: optax.Updates  # second moment, scalar per leaf


def novograd(
    learning_rate: optax.ScalarOrSchedule = 1e-3,
    beta1: float = 0.95,
    beta2: float = 0.98,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    grad_averaging: bool = False,
    amsgrad: bool = False,
    luc: bool = False,
    luc_trust: float = 1e-3,
    luc_eps: float = 1e-8,
) -> optax.GradientTransformation:
    def init_fn(params):
        # moments live in f32 regardless of param dtype: update_fn computes
        # and returns f32 (per-layer norms need the precision), so bf16-
        # param init would flip the opt-state dtype after step 1 — a full
        # train_step retrace mid-run and lossy moment casts on resume
        f32 = lambda p: jnp.zeros(p.shape, jnp.float32)
        mu = jax.tree_util.tree_map(f32, params)
        nu = jax.tree_util.tree_map(lambda p: jnp.zeros((), jnp.float32), params)
        if amsgrad:
            nu = (nu, jax.tree_util.tree_map(
                lambda p: jnp.zeros((), jnp.float32), params))
        return NovogradState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        if (weight_decay or luc) and params is None:
            raise ValueError("novograd with weight_decay/luc needs params")
        nu_cur = state.nu[0] if amsgrad else state.nu

        def upd_nu(g, nu):
            norm = jnp.sum(jnp.square(g.astype(jnp.float32)))
            return jnp.where(nu == 0.0, norm, beta2 * nu + (1.0 - beta2) * norm)

        new_nu = jax.tree_util.tree_map(upd_nu, updates, nu_cur)
        if amsgrad:
            new_max = jax.tree_util.tree_map(jnp.maximum, state.nu[1], new_nu)
            denom_tree = new_max
        else:
            denom_tree = new_nu

        def upd_mu(g, nu, mu, p):
            g = g.astype(jnp.float32) / (jnp.sqrt(nu) + eps)
            if weight_decay:
                g = g + weight_decay * p.astype(jnp.float32)
            if grad_averaging:
                g = g * (1.0 - beta1)
            return beta1 * mu.astype(jnp.float32) + g

        p_tree = params if params is not None else updates
        new_mu = jax.tree_util.tree_map(upd_mu, updates, denom_tree, state.mu, p_tree)

        lr = (
            learning_rate(state.count)
            if callable(learning_rate)
            else learning_rate
        )

        def make_update(m, p):
            if luc:
                data_norm = jnp.linalg.norm(p.astype(jnp.float32))
                grad_norm = jnp.linalg.norm(m)
                factor = jnp.minimum(
                    luc_trust * data_norm / (grad_norm + luc_eps), lr
                )
                return (-factor * m).astype(p.dtype)
            return (-lr * m).astype(p.dtype)

        out = jax.tree_util.tree_map(make_update, new_mu, p_tree)
        new_state = NovogradState(
            count=state.count + 1,
            mu=new_mu,
            nu=(new_nu, new_max) if amsgrad else new_nu,
        )
        return out, new_state

    return optax.GradientTransformation(init_fn, update_fn)

"""Routing-aware Adam: exact torch semantics for hard-routed experts.

The reference's per-language heads are a ``ModuleDict`` and each
language-homogeneous batch only runs its OWN head
(lid/ConformerLangModel.py:275-280) — so torch autograd leaves the other
heads' grads ``None`` and ``torch.optim.Adam`` **skips them entirely**:
no momentum decay, no second-moment decay, and their per-param ``step``
counter does not advance (bias correction stays at that head's own update
count).

Our TPU design evaluates all heads in ONE vmapped graph (stacked on a
leading language axis), so idle heads get *zero* gradients instead of
*absent* gradients.  Plain ``optax.adam`` then keeps moving idle heads
along decayed momentum and advances one global bias-correction step for
everyone — measurably divergent from the reference (caught by
scripts/ab_fidelity.py: steps 0-2 matched to 3e-7, step 3 — the first
revisit of a language — jumped to 3.5e-2).

``routed_adam`` restores the exact semantics with vector state:
- per-leaf step counts over the LEADING axis (a few KB, not a param copy),
- mu/nu/count frozen where the step's route mask is 0,
- bias correction from each row's own count,
- optional global-norm clipping folded in (the reference trainer clips
  raw grads at ccml/trainer.py:541; masked-out rows have zero grads and
  contribute nothing to the norm, matching torch).

The mask rides in through ``update(..., mask=...)``
(GradientTransformationExtraArgs); ``mask=None`` degrades to plain adam
(with per-row counts that all advance together).  This also makes epoch
freeze schedules exact: a frozen subtree's mu/nu/count stop advancing,
like torch ``requires_grad=False``.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax


class RoutedAdamState(NamedTuple):
    gstep: jax.Array  # scalar, drives lr schedules (reference: global step)
    count: Any  # pytree: per-leaf (leading,) or () update counts
    mu: Any
    nu: Any


def _row_activity(mask_leaf, param) -> jax.Array:
    """Mask leaf (scalar or broadcastable (L, 1, …)) → per-leading-row
    activity vector shaped like the count leaf."""
    m = jnp.asarray(mask_leaf, jnp.float32)
    active = (m > 0).astype(jnp.float32)
    if param.ndim == 0:
        return active.reshape(())
    lead = param.shape[0]
    if active.ndim == 0:
        return jnp.full((lead,), active, jnp.float32)
    rows = active.reshape(active.shape[0], -1).max(axis=-1)
    return jnp.broadcast_to(rows, (lead,))


def routed_adam(
    learning_rate: Union[float, Callable],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    clip_norm: Optional[float] = None,
) -> optax.GradientTransformationExtraArgs:
    def init(params):
        def count_like(p):
            return jnp.zeros(p.shape[:1] if p.ndim else (), jnp.float32)

        zeros = lambda p: jnp.zeros_like(p)  # noqa: E731
        return RoutedAdamState(
            gstep=jnp.zeros((), jnp.int32),
            count=jax.tree_util.tree_map(count_like, params),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(updates, state, params=None, *, mask=None, **extra):
        del extra
        grads = updates
        if clip_norm is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, clip_norm / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)

        if params is None:
            raise ValueError("routed_adam needs params for state shapes")
        if mask is None:
            mask = jax.tree_util.tree_map(
                lambda _: jnp.ones((), jnp.float32), params
            )

        rows = jax.tree_util.tree_map(_row_activity, mask, params)
        new_count = jax.tree_util.tree_map(
            lambda c, r: c + r, state.count, rows
        )
        gstep = state.gstep + 1
        lr = (
            learning_rate(gstep)
            if callable(learning_rate) else learning_rate
        )

        def expand(r, p):  # (L,) → (L, 1, …) to broadcast over the leaf
            return r.reshape(r.shape + (1,) * (p.ndim - 1)) if p.ndim else r

        def upd(g, m, n, c, r, p):
            ra = expand(r, p)
            ca = expand(jnp.maximum(c, 1.0), p)  # inactive rows: clamp only
            g32 = g.astype(jnp.float32)
            m_new = b1 * m + (1.0 - b1) * g32
            n_new = b2 * n + (1.0 - b2) * jnp.square(g32)
            m_sel = jnp.where(ra > 0, m_new, m)
            n_sel = jnp.where(ra > 0, n_new, n)
            m_hat = m_sel / (1.0 - b1**ca)
            n_hat = n_sel / (1.0 - b2**ca)
            step = -lr * m_hat / (jnp.sqrt(n_hat) + eps)
            return (
                jnp.where(ra > 0, step, 0.0).astype(p.dtype),
                m_sel,
                n_sel,
            )

        flat = jax.tree_util.tree_map(
            upd, grads, state.mu, state.nu, new_count, rows, params
        )
        three = jax.tree_util.tree_transpose(
            outer_treedef=jax.tree_util.tree_structure(params),
            inner_treedef=jax.tree_util.tree_structure((0, 0, 0)),
            pytree_to_transpose=flat,
        )
        steps, mu, nu = three
        return steps, RoutedAdamState(
            gstep=gstep, count=new_count, mu=mu, nu=nu
        )

    return optax.GradientTransformationExtraArgs(init, update)

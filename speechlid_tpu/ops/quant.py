"""Dynamic int8 quantized matmul for the serving path.

TPU v5e's MXU executes s8×s8→s32 matmuls at ~2× the bf16 rate (394 TOPS
vs 197 TFLOPS peak), and the flagship WavLM joint model is measured
MXU-bound at ~62 % MFU with no single hot spot
(docs/runs/CHIP_FINDINGS_r3.md "flagship decomposition") — int8 on the
dense projections is the one structural throughput lever left.

Design — dynamic symmetric quantization, no checkpoint changes:

- **weights**: per-output-channel symmetric int8 (abs-max over the
  contracting dim).  Quantization happens inside the jitted graph from
  the f32/bf16 kernel, so existing checkpoints load unchanged; the
  per-call requantize cost is O(d²) VPU work against O(d²·T) MXU work.
- **activations**: per-row (per token) dynamic symmetric int8 — the
  standard W8A8 recipe (LLM.int8()/SmoothQuant lineage; see PAPERS.md).
- accumulation in int32 on the MXU, rescale by the outer product of the
  row/column scales, cast back to the input dtype.

The reference has no quantized path (torch fp32/AMP only —
ccml/trainer.py:121); this is a beyond-parity serving feature, opt-in
via ``quant_dot='int8'`` on the model configs and OFF for training:
``jnp.round`` has a zero gradient a.e., so the module guards against
use under differentiation unless a straight-through estimator is
requested (``int8_dot_general_ste``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax


def _row_scales(x: jax.Array, axes: tuple) -> jax.Array:
    """Symmetric abs-max scale over ``axes``, keepdims, zero-safe."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    return jnp.where(s > 0, s / 127.0, 1.0)


def _quantize(x: jax.Array, scale: jax.Array) -> jax.Array:
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def int8_dot_general(
    lhs: jax.Array,
    rhs: jax.Array,
    dimension_numbers,
    precision: Any = None,
    preferred_element_type: Optional[Any] = None,
):
    """Drop-in ``lax.dot_general`` replacement computing in int8.

    Supports contractions WITHOUT batch dimensions (the ``nn.Dense``
    pattern and every projection in this repo).  Falls back to the f32
    dot for batched contractions rather than guessing scale layouts.
    """
    (lc, rc), (lb, rb) = dimension_numbers
    if lb or rb:  # batched dot (activation×activation): stay real-valued
        return lax.dot_general(
            lhs, rhs, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type,
        )
    lc, rc = tuple(lc), tuple(rc)
    out_dtype = preferred_element_type or jnp.result_type(lhs, rhs)

    ls = _row_scales(lhs, lc)  # lhs free dims kept, contracted dims = 1
    rs = _row_scales(rhs, rc)
    out32 = lax.dot_general(
        _quantize(lhs, ls),
        _quantize(rhs, rs),
        dimension_numbers,
        preferred_element_type=jnp.int32,
    )
    # out dims = lhs free dims ++ rhs free dims (dot_general contract order)
    ls_free = jnp.squeeze(ls, axis=lc)  # shape = lhs free dims
    rs_free = jnp.squeeze(rs, axis=rc)  # shape = rhs free dims
    scale = ls_free.reshape(ls_free.shape + (1,) * rs_free.ndim) * rs_free
    return (out32.astype(jnp.float32) * scale).astype(out_dtype)


import functools


@functools.lru_cache(maxsize=None)
def _make_ste_dot(dn):
    """One custom_vjp function per dimension_numbers (closed over, NOT an
    operand — operands become tracers under jit, and dimension numbers
    must stay static python values)."""
    (lc, rc), _ = dn

    @jax.custom_vjp
    def f(lhs, rhs):
        return int8_dot_general(lhs, rhs, dn)

    def fwd(lhs, rhs):
        return f(lhs, rhs), (lhs, rhs)

    def bwd(res, g):
        """Straight-through: gradients flow as if the dot were exact —
        standard dense-dot VJP via transposed dots."""
        lhs, rhs = res
        l_free = [i for i in range(lhs.ndim) if i not in lc]
        r_free = [i for i in range(rhs.ndim) if i not in rc]
        # g dims: l_free ++ r_free
        g_l = lax.dot_general(
            g, rhs,
            ((tuple(range(len(l_free), g.ndim)), tuple(r_free)), ((), ())),
        )  # dims: l_free ++ rc-of-rhs (in rc order)
        perm = [0] * lhs.ndim  # scatter contracted dims back into lhs layout
        for i, ax in enumerate(l_free):
            perm[ax] = i
        for i, ax in enumerate(lc):
            perm[ax] = len(l_free) + i
        g_l = jnp.transpose(g_l, axes=tuple(perm)).astype(lhs.dtype)
        g_r = lax.dot_general(
            lhs, g,
            ((tuple(l_free), tuple(range(len(l_free)))), ((), ())),
        )  # dims: lc-of-lhs (in lc order) ++ r_free
        perm_r = [0] * rhs.ndim
        for i, ax in enumerate(rc):
            perm_r[ax] = i
        for i, ax in enumerate(r_free):
            perm_r[ax] = len(rc) + i
        g_r = jnp.transpose(g_r, axes=tuple(perm_r)).astype(rhs.dtype)
        return g_l, g_r

    f.defvjp(fwd, bwd)
    return f


def int8_dot_general_ste(
    lhs, rhs, dimension_numbers, precision=None, preferred_element_type=None
):
    """int8 forward + straight-through (exact-dot) backward — usable for
    quantization-aware fine-tuning."""
    (lc, rc), (lb, rb) = dimension_numbers
    if lb or rb:
        return lax.dot_general(
            lhs, rhs, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type,
        )
    return _make_ste_dot(((tuple(lc), tuple(rc)), ((), ())))(lhs, rhs)


def quant_dot_general(kind: Optional[str]):
    """Config string → dot_general injectable into ``nn.Dense``.

    None/'f32' → None (flax default), 'int8' → serving quantized dot,
    'int8_ste' → quantized forward with straight-through backward."""
    if kind in (None, "", "f32", "none"):
        return None
    if kind == "int8":
        return int8_dot_general
    if kind == "int8_ste":
        return int8_dot_general_ste
    raise ValueError(f"unknown quant_dot kind: {kind!r}")

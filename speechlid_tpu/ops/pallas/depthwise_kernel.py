"""Pallas TPU kernel: depthwise (per-channel) 1-D convolution, 'SAME'.

Why a kernel for an op XLA already has: the axon-TPU backend's compiler
NEVER terminates when a bf16 grouped conv (``feature_group_count ==
channels``) fuses with any elementwise producer/consumer (bisected in
docs/runs/bf16_convmod_bisect.py — the ConformerConvModule hang that
blocked full-bf16 models in round 2).  ``lax.optimization_barrier``
works around the fusion; this kernel removes the grouped conv from XLA's
hands entirely — and a depthwise conv is not MXU work in the first
place: it is k shifted elementwise multiply-accumulates, exactly the
VPU's (8×128 lanes) shape, so the kernel is also the honest lowering.

Design: grid over the batch; each program holds one utterance's padded
(T+k-1, C) block in VMEM plus the (k, C) weights, and accumulates the k
shifted products in f32 (inputs may be bf16).  BatchNorm/Swish stay in
XLA — they fuse fine.

Backward is custom_vjp: dX is the same kernel with time-flipped weights
(a depthwise correlation); dW/db are plain XLA reductions over shifted
slices (no grouped conv appears anywhere in the backward either).

Off-TPU the kernel runs in interpret mode so CPU tests pin exact parity
against ``lax.conv_general_dilated`` (tests/test_pallas_depthwise.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# pallas_call blocks with a leading length-1 dim arrive as (1, T, C);
# reshape views inside the kernel
def _dw_kernel_3d(x_ref, w_ref, out_ref, *, k: int):
    t_out = out_ref.shape[1]
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for j in range(k):
        acc = acc + (
            x_ref[0, j : j + t_out, :].astype(jnp.float32)
            * w_ref[j, :].astype(jnp.float32)[None, :]
        )
    out_ref[0, :, :] = acc.astype(out_ref.dtype)


def _dw_forward(x: jax.Array, w: jax.Array) -> jax.Array:
    """(B, T, C) ⊛ (k, C) depthwise, 'SAME' → (B, T, C)."""
    return _dw_forward_swapped(x, w, pad_l=(w.shape[0] - 1) // 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def depthwise_conv1d(x: jax.Array, w: jax.Array, bias: jax.Array):
    """Differentiable depthwise conv1d 'SAME': (B, T, C) ⊛ (k, C) + (C,)."""
    return _dw_forward(x, w) + bias[None, None, :].astype(x.dtype)


def _dw_fwd(x, w, bias):
    return depthwise_conv1d(x, w, bias), (x, w)


def _dw_bwd(res, g):
    x, w = res
    k, c = w.shape
    pad_l = (k - 1) // 2
    pad_r = k - 1 - pad_l
    # dX: depthwise correlation = same kernel with time-flipped weights
    # (swap the asymmetric 'SAME' halo for even k; k is usually odd)
    dx = _dw_forward_swapped(g, jnp.flip(w, axis=0), pad_l=pad_r)
    # dW[j] = Σ_{b,t} x_pad[:, t+j, :]·g[:, t, :] — plain XLA reductions
    # over k static shifts; f32 accumulation, NO grouped conv anywhere
    t = x.shape[1]
    xp = jnp.pad(x, [(0, 0), (pad_l, pad_r), (0, 0)]).astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    dw = jnp.stack(
        [jnp.sum(xp[:, j : j + t, :] * g32, axis=(0, 1)) for j in range(k)]
    ).astype(w.dtype)
    db = jnp.sum(g32, axis=(0, 1)).astype(w.dtype)
    return dx.astype(x.dtype), dw, db


def _dw_forward_swapped(x, w, pad_l):
    """_dw_forward with an explicit left halo (for the flipped backward
    when k is even; identical to _dw_forward for odd k).

    Dispatch is on the LOWERING platform, not the process default: the
    same trace may be lowered for CPU (CPU-backend param init, multi-
    backend jit — the exact combination the bf16-axon flagship uses), and
    a Mosaic TPU kernel lowered for CPU crashes.  Non-TPU lowerings take
    the plain XLA grouped conv (numerically identical; the compile-hang
    this kernel works around is axon-TPU-only).  Set
    SPEECHLID_DW_INTERPRET=1 to force the interpret-mode kernel anywhere
    (the parity tests do)."""
    import os

    if os.environ.get("SPEECHLID_DW_INTERPRET"):
        return _pallas_impl(x, w, pad_l, interpret=True)
    return jax.lax.platform_dependent(
        x, w,
        tpu=functools.partial(_pallas_impl, pad_l=pad_l, interpret=False),
        default=functools.partial(_xla_impl, pad_l=pad_l),
    )


def _xla_impl(x, w, pad_l):
    """Plain grouped conv with an explicit halo — the non-TPU lowering."""
    k, c = w.shape
    return jax.lax.conv_general_dilated(
        x, w[:, None, :], (1,), [(pad_l, k - 1 - pad_l)],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
    )


def _pallas_impl(x, w, pad_l, interpret):
    b, t, c = x.shape
    k = w.shape[0]
    c_pad = _round_up(c, 128)
    t_out = _round_up(t, 8)
    t_in = _round_up(t_out + k - 1, 8)
    xp = jnp.pad(x, [(0, 0), (pad_l, t_in - t - pad_l), (0, c_pad - c)])
    wp = jnp.pad(w, [(0, _round_up(k, 8) - k), (0, c_pad - c)])
    out = pl.pallas_call(
        functools.partial(_dw_kernel_3d, k=k),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t_in, c_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_out, c_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_out, c_pad), x.dtype),
        interpret=interpret,
    )(xp, wp)
    return out[:, :t, :c]


depthwise_conv1d.defvjp(_dw_fwd, _dw_bwd)

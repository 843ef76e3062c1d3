"""Temporal pooling zoo (reference: lid/model/pooling_layers.py — wespeaker's
TAP/TSDP/TSTP/ASTP/MHASTP/MQMHASTP).

Convention change for TPU: inputs are (B, T, F) time-major-last-feature
(flax idiom), optionally with a (B, T) boolean mask so padded frames never
contribute to statistics — the reference pools over padded frames because
its CPU batches are effectively unpadded per-language chunks.
4-D resnet maps (B, T, F', C) are flattened to (B, T, F'·C) by the caller.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _masked_moments(x: jax.Array, mask: Optional[jax.Array], eps: float):
    """mean/std over time of (B, T, F) with optional (B, T) mask."""
    if mask is None:
        mean = jnp.mean(x, axis=1)
        var = jnp.var(x, axis=1)
    else:
        m = mask[:, :, None].astype(x.dtype)
        n = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        mean = jnp.sum(x * m, axis=1) / n
        var = jnp.sum((x - mean[:, None, :]) ** 2 * m, axis=1) / n
    return mean, jnp.sqrt(var + eps)


class TAP(nn.Module):
    """Temporal average pooling."""

    @nn.compact
    def __call__(self, x, mask=None):
        mean, _ = _masked_moments(x, mask, 0.0)
        return mean

    @staticmethod
    def out_dim(in_dim: int) -> int:
        return in_dim


class TSDP(nn.Module):
    """Temporal standard-deviation pooling (eps 1e-7 as reference :58)."""

    @nn.compact
    def __call__(self, x, mask=None):
        _, std = _masked_moments(x, mask, 1e-7)
        return std

    @staticmethod
    def out_dim(in_dim: int) -> int:
        return in_dim


class TSTP(nn.Module):
    """Mean ‖ std statistics pooling (x-vector default)."""

    @nn.compact
    def __call__(self, x, mask=None):
        mean, std = _masked_moments(x, mask, 1e-7)
        return jnp.concatenate([mean, std], axis=-1)

    @staticmethod
    def out_dim(in_dim: int) -> int:
        return 2 * in_dim


class ASTP(nn.Module):
    """Attentive statistics pooling (ECAPA style, reference :92-145):
    α = softmax_t(V·tanh(W·x)), weighted mean ‖ std."""

    bottleneck_dim: int = 128
    global_context_att: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        in_dim = x.shape[-1]
        if self.global_context_att:
            mean, std = _masked_moments(x, mask, 1e-10)
            t = x.shape[1]
            ctx = jnp.concatenate(
                [x,
                 jnp.broadcast_to(mean[:, None, :], x.shape),
                 jnp.broadcast_to(std[:, None, :], x.shape)],
                axis=-1,
            )
        else:
            ctx = x
        alpha = jnp.tanh(nn.Dense(self.bottleneck_dim, name="linear1")(ctx))
        alpha = nn.Dense(in_dim, name="linear2")(alpha)  # (B, T, F)
        if mask is not None:
            alpha = jnp.where(mask[:, :, None], alpha, jnp.finfo(jnp.float32).min)
        alpha = jax.nn.softmax(alpha, axis=1)
        mean = jnp.sum(alpha * x, axis=1)
        var = jnp.sum(alpha * x**2, axis=1) - mean**2
        std = jnp.sqrt(jnp.maximum(var, 1e-10))
        return jnp.concatenate([mean, std], axis=-1)

    @staticmethod
    def out_dim(in_dim: int) -> int:
        return 2 * in_dim


class MHASTP(nn.Module):
    """Multi-head attentive statistics pooling (reference :147-221).

    The per-head conv stacks become one Dense applied to the head-split
    tensor under einsum — all heads evaluate in a single matmul.
    """

    layer_num: int = 2
    head_num: int = 2
    d_s: int = 1
    bottleneck_dim: int = 64

    @nn.compact
    def __call__(self, x, mask=None):
        b, t, f = x.shape
        assert f % self.head_num == 0
        d_model = f // self.head_num
        d_s = d_model if self.d_s > 1 else 1
        xh = x.reshape(b, t, self.head_num, d_model)  # (B,T,H,D)

        dims = [self.bottleneck_dim] * (self.layer_num + 1)
        dims[0], dims[-1] = d_model, d_s
        score = xh
        for i in range(self.layer_num):
            w = self.param(
                f"att_w_{i}", nn.initializers.lecun_normal(),
                (self.head_num, dims[i], dims[i + 1]),
            )
            bias = self.param(
                f"att_b_{i}", nn.initializers.zeros, (self.head_num, dims[i + 1])
            )
            score = jnp.einsum("bthd,hde->bthe", score, w) + bias
            if i < self.layer_num - 1:
                score = jnp.tanh(score)
        if score.shape[-1] == 1:
            score = jnp.broadcast_to(score, xh.shape)
        if mask is not None:
            score = jnp.where(
                mask[:, :, None, None], score, jnp.finfo(jnp.float32).min
            )
        alpha = jax.nn.softmax(score, axis=1)  # softmax over time
        mean = jnp.sum(alpha * xh, axis=1)  # (B,H,D)
        var = jnp.sum(alpha * xh**2, axis=1) - mean**2
        std = jnp.sqrt(jnp.maximum(var, 1e-10))
        out = jnp.concatenate([mean, std], axis=-1)  # (B,H,2D)
        return out.reshape(b, 2 * f)

    @staticmethod
    def out_dim(in_dim: int) -> int:
        return 2 * in_dim


class MQMHASTP(nn.Module):
    """Multi-query MHASTP (reference :221-282): Q independent MHASTP heads
    concatenated."""

    layer_num: int = 2
    query_num: int = 2
    head_num: int = 8
    d_s: int = 2
    bottleneck_dim: int = 64

    @nn.compact
    def __call__(self, x, mask=None):
        outs = [
            MHASTP(self.layer_num, self.head_num, self.d_s,
                   self.bottleneck_dim, name=f"query_{i}")(x, mask)
            for i in range(self.query_num)
        ]
        return jnp.concatenate(outs, axis=-1)

    @staticmethod
    def out_dim(in_dim: int, query_num: int = 2) -> int:
        return 2 * in_dim * query_num


POOLING_LAYERS = {
    "TAP": TAP,
    "TSDP": TSDP,
    "TSTP": TSTP,
    "ASTP": ASTP,
    "MHASTP": MHASTP,
    "MQMHASTP": MQMHASTP,
}


def make_pooling(pooling_func: str, **kwargs) -> nn.Module:
    """kwargs (incl. flax's ``name``) forwarded to the layer constructor."""
    return POOLING_LAYERS[pooling_func](**kwargs)


def pooling_out_dim(name: str, in_dim: int, query_num: int = 2) -> int:
    if name == "MQMHASTP":
        return MQMHASTP.out_dim(in_dim, query_num)
    return POOLING_LAYERS[name].out_dim(in_dim)

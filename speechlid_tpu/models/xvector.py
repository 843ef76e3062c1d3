"""Kaldi-style TDNN x-vector (reference: lid/model/xvector.py XVEC, used by
PretrainLidModel's XVectorModel backend at lid/PretrainLidModel.py:273-385).

TDNN layers are dilated 1-D convs (VALID padding, as the reference's
padding=0) + ReLU + affine-free BatchNorm; pooling from the wespeaker zoo;
two segment-level embedding layers.  Returns (embed_a, embed_b) like the
reference.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechlid_tpu.models.pooling import make_pooling


class TdnnLayer(nn.Module):
    out_dim: int
    context_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # (B, T, F) → (B, T', out_dim); VALID: T' = T - dilation*(ctx-1)
        x = nn.Conv(
            self.out_dim,
            (self.context_size,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
        )(x)
        x = jax.nn.relu(x)
        return nn.BatchNorm(
            momentum=0.9,
            use_running_average=not train, use_bias=False, use_scale=False
        )(x)

    def out_lengths(self, lengths: jax.Array) -> jax.Array:
        return lengths - self.dilation * (self.context_size - 1)


class XVEC(nn.Module):
    feat_dim: int = 40
    hid_dim: int = 512
    stats_dim: int = 1500
    embed_dim: int = 512
    pooling_func: str = "TSTP"

    # (context_size, dilation) per frame layer — kaldi x-vector recipe
    _CONTEXTS = ((5, 1), (3, 2), (3, 3), (1, 1), (1, 1))

    def out_lengths(self, lengths: jax.Array) -> jax.Array:
        for ctx, dil in self._CONTEXTS:
            lengths = lengths - dil * (ctx - 1)
        return lengths

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, T, feat_dim)
        lengths: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        dims = [self.hid_dim] * 4 + [self.stats_dim]
        for i, ((ctx, dil), dim) in enumerate(zip(self._CONTEXTS, dims)):
            x = TdnnLayer(dim, ctx, dil, name=f"frame_{i + 1}")(x, train)
        mask = None
        if lengths is not None:
            out_len = self.out_lengths(lengths)
            mask = jnp.arange(x.shape[1])[None, :] < out_len[:, None]
        stats = make_pooling(self.pooling_func, name="pool")(x, mask)
        embed_a = nn.Dense(self.embed_dim, name="seg_1")(stats)
        out = jax.nn.relu(embed_a)
        out = nn.BatchNorm(
            momentum=0.9,
            use_running_average=not train, use_bias=False, use_scale=False,
            name="seg_bn_1",
        )(out)
        embed_b = nn.Dense(self.embed_dim, name="seg_2")(out)
        return embed_a, embed_b

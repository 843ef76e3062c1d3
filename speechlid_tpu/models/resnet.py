"""wespeaker-style ResNet on fbank maps (reference: lid/model/resnet.py —
modified He resnet: k3 stem, no max-pool, smaller channels; pooling over the
flattened (freq·channel, time) map; used by LidResnetWeSpeaker at
lid/PretrainLidModel.py:413-446).

NHWC layout (B, T, F, C) — TPU-native; the reference's (B, C, F, T) permutes
are layout bookkeeping, not semantics.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechlid_tpu.models.pooling import make_pooling


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(momentum=0.9, use_running_average=not train, name=name)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False, name="conv1")(x)
        out = jax.nn.relu(norm("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      name="conv2")(out)
        out = norm("bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, name="shortcut_conv")(x)
            x = norm("shortcut_bn")(x)
        return jax.nn.relu(out + x)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(momentum=0.9, use_running_average=not train, name=name)
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = jax.nn.relu(norm("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False, name="conv2")(out)
        out = jax.nn.relu(norm("bn2")(out))
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = norm("bn3")(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            x = nn.Conv(self.planes * self.expansion, (1, 1),
                        strides=(self.stride, self.stride), use_bias=False,
                        name="shortcut_conv")(x)
            x = norm("shortcut_bn")(x)
        return jax.nn.relu(out + x)


class ResNet(nn.Module):
    block: type = BasicBlock
    num_blocks: Sequence[int] = (2, 2, 2, 2)
    m_channels: int = 32
    feat_dim: int = 40
    embed_dim: int = 128
    pooling_func: str = "TSTP"
    two_emb_layer: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, T, feat_dim)
        lengths: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        y = x[:, :, :, None]  # (B, T, F, 1) NHWC
        y = nn.Conv(self.m_channels, (3, 3), padding=1, use_bias=False,
                    name="conv1")(y)
        y = jax.nn.relu(
            nn.BatchNorm(momentum=0.9, use_running_average=not train, name="bn1")(y)
        )
        strides = (1, 2, 2, 2)
        for li, (n, s) in enumerate(zip(self.num_blocks, strides)):
            planes = self.m_channels * (2**li)
            for bi in range(n):
                y = self.block(planes, s if bi == 0 else 1,
                               name=f"layer{li + 1}_{bi}")(y, train)
        # (B, T', F', C) → (B, T', F'·C): pool over flattened freq×channels
        b, t, f, c = y.shape
        y = y.reshape(b, t, f * c)
        mask = None
        if lengths is not None:
            # time downsampled 8× by the three stride-2 stages (ceil division
            # from SAME padding)
            out_len = lengths
            for s in strides:
                out_len = (out_len + s - 1) // s
            mask = jnp.arange(t)[None, :] < out_len[:, None]
        stats = make_pooling(self.pooling_func, name="pool")(y, mask)
        embed_a = nn.Dense(self.embed_dim, name="seg_1")(stats)
        if not self.two_emb_layer:
            return jnp.zeros(()), embed_a
        out = jax.nn.relu(embed_a)
        out = nn.BatchNorm(momentum=0.9, use_running_average=not train, use_bias=False,
                           use_scale=False, name="seg_bn_1")(out)
        embed_b = nn.Dense(self.embed_dim, name="seg_2")(out)
        return embed_a, embed_b


def _factory(block, blocks):
    def make(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=True):
        return ResNet(block=block, num_blocks=blocks, feat_dim=feat_dim,
                      embed_dim=embed_dim, pooling_func=pooling_func,
                      two_emb_layer=two_emb_layer)

    return make


ResNet18 = _factory(BasicBlock, (2, 2, 2, 2))
ResNet34 = _factory(BasicBlock, (3, 4, 6, 3))
ResNet50 = _factory(Bottleneck, (3, 4, 6, 3))
ResNet101 = _factory(Bottleneck, (3, 4, 23, 3))
ResNet152 = _factory(Bottleneck, (3, 8, 36, 3))
ResNet221 = _factory(Bottleneck, (6, 16, 48, 3))
ResNet293 = _factory(Bottleneck, (10, 20, 64, 3))

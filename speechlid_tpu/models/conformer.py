"""From-scratch Conformer encoder (flax.linen), TPU-first.

Architecture parity with the reference's from-scratch Conformer
(lid/conformer.py): ConformerBlock = ½FF + MHSA(Shaw rel-pos, clamp ±512)
+ conv module (pointwise→GLU→depthwise k31→BN→Swish→pointwise) + ½FF +
post-LN (conformer.py:211-259); Conv1d ×2 / ESPnet Conv2d ×4 subsampling
(:328-394); stochastic depth with survival prob scaled linearly by depth
(:446-466); in-model FBank feature layer with training-time SpecAugment
(:262-325).

TPU-first departures from the reference:
- explicit boolean pad masks everywhere (the reference passes mask=None in
  practice and relies on CPU-side ragged batches);
- stochastic depth draws from the module's jax PRNG stream and selects with
  ``jnp.where`` — both branches trace once, no data-dependent control flow;
- computation dtype is configurable (bf16 activations, f32 layernorm/
  softmax accumulations via ``preferred_element_type`` handled by XLA);
- the FBank layer reuses the batched device frontend (ops/frontend.py)
  instead of a per-item CPU transform.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechlid_tpu.ops import frontend as F
from speechlid_tpu.ops.quant import quant_dot_general

Dtype = Any


def _on_axon_backend() -> bool:
    """True on the experimental axon TPU worker — the only backend whose
    compiler hangs on bf16 depthwise-conv fusions
    (docs/runs/bf16_convmod_bisect.py).  The chip registers as platform
    'tpu', so the reliable marker is the axon-pool env var its site
    bootstrap requires; SPEECHLID_CONV_BARRIER=1/0 overrides either way."""
    import os

    forced = os.environ.get("SPEECHLID_CONV_BARRIER")
    if forced is not None:
        return forced not in ("0", "", "false")
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS"))


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def double_swish(x: jax.Array) -> jax.Array:
    """x * sigmoid(x - 1) (reference DoubleSwish, conformer.py:39-44)."""
    return x * jax.nn.sigmoid(x - 1.0)


class FeedForward(nn.Module):
    """dim → dim*mult → dim with Swish (conformer.py:153-171)."""

    dim: int
    mult: int = 4
    dropout: float = 0.0
    use_double_swish: bool = False
    dtype: Dtype = jnp.float32
    quant_dot: Optional[str] = None  # 'int8' serving path (ops/quant.py)

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        act = double_swish if self.use_double_swish else swish
        dg = quant_dot_general(self.quant_dot)
        x = nn.Dense(self.dim * self.mult, dtype=self.dtype, dot_general=dg)(x)
        x = act(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.dim, dtype=self.dtype, dot_general=dg)(x)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


class RelPosAttention(nn.Module):
    """MHSA with Shaw relative position bias (conformer.py:92-151):
    dots = qk^T·scale + q·E[clip(i-j, ±max_pos)]·scale."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    max_pos_emb: int = 512
    dtype: Dtype = jnp.float32
    quant_dot: Optional[str] = None  # int8 q/kv/out projections only —
    # the attention einsums (act×act, small at these T) stay real-valued

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        inner = h * d
        dg = quant_dot_general(self.quant_dot)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q",
                     dot_general=dg)(x)
        kv = nn.Dense(2 * inner, use_bias=False, dtype=self.dtype,
                      name="to_kv", dot_general=dg)(x)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, d).transpose(0, 2, 1, 3)

        scale = d**-0.5
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * scale

        # Shaw relative position embedding table (2P+1, d)
        rel_emb = self.param(
            "rel_pos_emb",
            nn.initializers.normal(1.0),
            (2 * self.max_pos_emb + 1, d),
        ).astype(self.dtype)
        seq = jnp.arange(n)
        dist = jnp.clip(
            seq[:, None] - seq[None, :], -self.max_pos_emb, self.max_pos_emb
        ) + self.max_pos_emb  # (n, n)
        # q·E^T: (b,h,n,d)×(d,2P+1) → gather along rel-distance axis.  At
        # n ≤ ~1000 ≪ 2P+1 this is one MXU matmul + a cheap gather —
        # preferable on TPU to materializing (n, n, d) embeddings.
        pos_scores = jnp.einsum("bhnd,rd->bhnr", q, rel_emb) * scale
        pos_attn = jnp.take_along_axis(
            pos_scores, dist[None, None, :, :], axis=-1
        )  # (b,h,n,n)
        dots = dots + pos_attn

        if mask is not None:
            pair = mask[:, None, :, None] & mask[:, None, None, :]
            dots = jnp.where(pair, dots, jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out",
                       dot_general=dg)(out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class _PallasDepthwise(nn.Module):
    """Depthwise conv1d via the Pallas VPU kernel, with nn.Conv's exact
    param tree (kernel (k, 1, C) + bias (C,), same init) so checkpoints
    are interchangeable with the XLA implementation."""

    features: int
    kernel_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        from speechlid_tpu.ops.pallas.depthwise_kernel import depthwise_conv1d

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, 1, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return depthwise_conv1d(
            y.astype(self.dtype),
            kernel[:, 0, :].astype(self.dtype),
            bias.astype(self.dtype),
        )


class _MaskedBatchNorm(nn.Module):
    """BatchNorm whose batch statistics exclude padded frames.

    The reference normalizes over batch-max-padded tensors (so its stats
    are already padding-contaminated); bucketed static shapes pad MORE,
    so here valid-frame masking is required, not optional.  Param/state
    leaf names match flax ``nn.BatchNorm`` ('scale'/'bias',
    batch_stats 'mean'/'var') — checkpoints are interchangeable."""

    use_running_average: bool
    # torch nn.BatchNorm1d default momentum=0.1 (the reference's BN,
    # conformer.py:197) ⇒ running = 0.9*running + 0.1*batch.  flax's 0.99
    # default tracks 10× slower and leaves eval-mode stats init-biased for
    # the first few hundred steps — a real train/eval metric gap on short
    # runs (docs/runs/CHIP_FINDINGS_r3.md "Train/eval metric gap").
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: Optional[jax.Array] = None
    ) -> jax.Array:  # x (B, T, C); mask (B, T) True = valid
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if mask is None:
                n = jnp.float32(x.shape[0] * x.shape[1])
                mean = xf.mean(axis=(0, 1))
                var = xf.var(axis=(0, 1))
            else:
                m = mask[..., None].astype(jnp.float32)
                n = jnp.maximum(m.sum(axis=(0, 1)), 1.0)
                mean = (xf * m).sum(axis=(0, 1)) / n
                var = (jnp.square(xf) * m).sum(axis=(0, 1)) / n - jnp.square(
                    mean
                )
            if not self.is_initializing():
                # torch stores the UNBIASED variance in running_var while
                # normalizing with the biased one — match both.
                var_u = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var_u
                )
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class ConformerConvModule(nn.Module):
    """LN → pointwise(2·expansion) → GLU → depthwise k31 'same' → BN →
    Swish → pointwise → dropout (conformer.py:174-208)."""

    dim: int
    expansion_factor: int = 2
    kernel_size: int = 31
    dropout: float = 0.0
    use_double_swish: bool = False
    dtype: Dtype = jnp.float32
    # Fence the depthwise grouped conv off from its elementwise
    # producers/consumers with ``lax.optimization_barrier``: the axon-TPU
    # XLA backend never finishes compiling a bf16 grouped conv once GLU/BN
    # fuse into it (bisected in docs/runs/bf16_convmod_bisect.py — every
    # piece passes alone, any fused pair hangs).  None = auto: barrier
    # exactly when running in bf16 on that backend, a numerical no-op
    # either way.
    conv_barrier: Optional[bool] = None
    # depthwise implementation: 'xla' (lax grouped conv), 'pallas' (VPU
    # kernel, ops/pallas/depthwise_kernel.py — removes the grouped conv
    # from XLA entirely), or 'auto' (pallas exactly where the XLA lowering
    # is broken: bf16 on the axon backend).  Same param tree either way.
    conv_impl: str = "auto"
    quant_dot: Optional[str] = None  # int8 pointwise projections

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        pad_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        act = double_swish if self.use_double_swish else swish
        inner = self.dim * self.expansion_factor
        is_bf16 = jnp.dtype(self.dtype) == jnp.dtype(jnp.bfloat16)
        use_pallas = self.conv_impl == "pallas" or (
            self.conv_impl == "auto" and is_bf16 and _on_axon_backend()
        )
        barrier = self.conv_barrier
        if barrier is None:
            # auto: only where the workaround is needed — bf16 AND the
            # axon backend (whose compiler owns the hang) — and only for
            # the XLA grouped conv; the Pallas kernel needs no fence.
            barrier = is_bf16 and not use_pallas and _on_axon_backend()
        fence = jax.lax.optimization_barrier if barrier else (lambda y: y)
        dg = quant_dot_general(self.quant_dot)
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(2 * inner, dtype=self.dtype,
                     dot_general=dg)(y)  # pointwise conv1x1
        a, g = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.sigmoid(g)  # GLU
        if pad_mask is not None:
            # keep padded frames from leaking into the depthwise conv
            y = jnp.where(pad_mask[:, :, None], y, 0.0)
        if use_pallas:
            y = _PallasDepthwise(
                inner, self.kernel_size, self.dtype, name="depthwise"
            )(y)
        else:
            y = nn.Conv(
                inner,
                (self.kernel_size,),
                padding="SAME",
                feature_group_count=inner,
                dtype=self.dtype,
                name="depthwise",
            )(fence(y))
            y = fence(y)
        y = _MaskedBatchNorm(
            use_running_average=deterministic, dtype=self.dtype, name="bn"
        )(y, pad_mask)
        y = act(y)
        y = nn.Dense(self.dim, dtype=self.dtype, dot_general=dg)(y)
        return nn.Dropout(self.dropout, deterministic=deterministic)(y)


class ConformerBlock(nn.Module):
    """½FF → MHSA → conv → ½FF → post-LN, all pre-norm residual
    (conformer.py:211-259)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    conv_expansion_factor: int = 2
    conv_kernel_size: int = 31
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    conv_dropout: float = 0.0
    use_double_swish: bool = False
    dtype: Dtype = jnp.float32
    quant_dot: Optional[str] = None  # int8 serving path for every Dense

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        ff1 = FeedForward(
            self.dim, self.ff_mult, self.ff_dropout, self.use_double_swish,
            self.dtype, self.quant_dot, name="ff1",
        )
        x = 0.5 * ff1(nn.LayerNorm(dtype=self.dtype)(x), deterministic) + x
        attn = RelPosAttention(
            self.dim, self.heads, self.dim_head, self.attn_dropout,
            dtype=self.dtype, quant_dot=self.quant_dot, name="attn",
        )
        x = attn(nn.LayerNorm(dtype=self.dtype)(x), mask, deterministic) + x
        conv = ConformerConvModule(
            self.dim, self.conv_expansion_factor, self.conv_kernel_size,
            self.conv_dropout, self.use_double_swish, self.dtype,
            quant_dot=self.quant_dot, name="conv",
        )
        x = conv(x, deterministic, pad_mask=mask) + x
        # ff2 deliberately ignores use_double_swish: the reference builds
        # its second half-FFN WITHOUT the flag (conformer.py:244) while
        # ff1/conv honor it — parity, not an oversight
        ff2 = FeedForward(
            self.dim, self.ff_mult, self.ff_dropout, False, self.dtype,
            self.quant_dot, name="ff2",
        )
        x = 0.5 * ff2(nn.LayerNorm(dtype=self.dtype)(x), deterministic) + x
        return nn.LayerNorm(dtype=self.dtype, name="post_norm")(x)


class Conv1dSubSampling2(nn.Module):
    """conv1d k3 s2 p1 + ReLU + Linear: T → ⌊(T+1)/2⌋ (conformer.py:328-350)."""

    odim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, idim)
        idim = x.shape[-1]
        x = nn.Conv(idim, (3,), strides=(2,), padding=[(1, 1)], dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        return nn.Dense(self.odim, dtype=self.dtype)(x)

    @staticmethod
    def out_lengths(lengths: jax.Array) -> jax.Array:
        # conv k3 s2 p1: T' = floor((T + 2 - 3)/2) + 1 = floor((T-1)/2)+1
        return (lengths - 1) // 2 + 1


class _BlockStep(nn.Module):
    """One nn.scan step of the block stack: ConformerBlock + linear
    stochastic depth keyed by the (traced) block index.  Scanned with
    ``variable_axes={'params': 0}`` so per-block params stack on a leading
    layer axis — O(1)-in-depth compiles and the layout
    ``parallel.pipeline.pipeline_apply`` stages directly."""

    block_conf: dict
    n_blocks: int
    stochastic_depth_p: float
    use_stochastic_depth: bool

    @nn.compact
    def __call__(self, carry, idx, mask, deterministic):
        x = carry
        y = ConformerBlock(**self.block_conf)(x, mask, deterministic)
        if self.use_stochastic_depth and not deterministic:
            # survival p_i = 1 - ((i+1)/N)(1 - p); same whole-batch
            # keep/skip-via-where scheme as the unrolled path
            p_i = 1.0 - ((idx + 1.0) / self.n_blocks) * (
                1.0 - self.stochastic_depth_p
            )
            keep = jax.random.bernoulli(
                self.make_rng("stochastic_depth"), p_i
            )
            y = jnp.where(keep, y, x)
        return y, None


class Conv2dSubsampling(nn.Module):
    """ESPnet 2D ×4 subsampling: two conv k3 s2 (VALID) over (T, mel) then
    Linear (conformer.py:351-394)."""

    odim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, idim)
        idim = x.shape[-1]
        y = x[:, :, :, None]  # NHWC: (B, T, idim, 1)
        y = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype)(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype)(y)
        y = jax.nn.relu(y)
        b, t, f, c = y.shape
        y = y.reshape(b, t, f * c)
        return nn.Dense(self.odim, dtype=self.dtype)(y)

    @staticmethod
    def out_lengths(lengths: jax.Array) -> jax.Array:
        return ((lengths - 1) // 2 - 1) // 2


class ConformerModel(nn.Module):
    """Subsample → ×sqrt(d) scale (the rel-pos encoder's x-path; the additive
    table is unused by design, conformer.py:446 comment) → N ConformerBlocks
    with linear stochastic depth (conformer.py:397-466)."""

    n_blocks: int = 14
    n_mels: int = 80
    encoder_dim: int = 144
    dim_head: int = 64
    heads: int = 4
    ff_mult: int = 4
    conv_expansion_factor: int = 2
    conv_kernel_size: int = 31
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    conv_dropout: float = 0.0
    pos_dropout: float = 0.1
    use_double_swish: bool = False
    sub_sampling: int = 2
    stochastic_depth_p: float = 0.7
    use_stochastic_depth: bool = True
    # rematerialize each block in the backward pass: smaller fused backward
    # kernels + ~30% less activation memory for ~1 extra forward of FLOPs —
    # also the stable configuration for the experimental axon TPU worker,
    # whose largest fully-fused training graphs can fault (verify SKILL.md)
    remat: bool = False
    # nn.scan over the block stack: ONE traced/compiled block instead of N
    # (compile time O(1) in depth — minutes matter on remote-compile TPU
    # deployments), params stacked on a leading (N, ...) layer axis the
    # pipeline-parallel runner (parallel/pipeline.py) consumes directly.
    # Checkpoint param trees differ from the unrolled layout (blocks/ vs
    # block_i/); numerics are identical (tests/test_models.py).
    scan_blocks: bool = False
    dtype: Dtype = jnp.float32
    quant_dot: Optional[str] = None  # int8 serving path (ops/quant.py)

    def subsampled_lengths(self, lengths: jax.Array) -> jax.Array:
        if self.sub_sampling == 4:
            return Conv2dSubsampling.out_lengths(lengths)
        return Conv1dSubSampling2.out_lengths(lengths)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, T, n_mels)
        lengths: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        if self.sub_sampling == 4:
            x = Conv2dSubsampling(self.encoder_dim, self.dtype, name="subsample")(x)
        else:
            x = Conv1dSubSampling2(self.encoder_dim, self.dtype, name="subsample")(x)
        x = x * math.sqrt(self.encoder_dim)
        x = nn.Dropout(self.pos_dropout, deterministic=deterministic)(x)

        mask = None
        if lengths is not None:
            sub_len = self.subsampled_lengths(lengths)
            mask = jnp.arange(x.shape[1])[None, :] < sub_len[:, None]

        block_conf = dict(
            dim=self.encoder_dim,
            dim_head=self.dim_head,
            heads=self.heads,
            ff_mult=self.ff_mult,
            conv_expansion_factor=self.conv_expansion_factor,
            conv_kernel_size=self.conv_kernel_size,
            attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout,
            conv_dropout=self.conv_dropout,
            use_double_swish=self.use_double_swish,
            dtype=self.dtype,
            quant_dot=self.quant_dot,
        )
        if self.scan_blocks:
            step_cls = (
                nn.remat(_BlockStep, static_argnums=(4,))
                if self.remat else _BlockStep
            )
            scanned = nn.scan(
                step_cls,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True,
                            "stochastic_depth": True},
                in_axes=(0, nn.broadcast, nn.broadcast),
                length=self.n_blocks,
            )(
                block_conf=block_conf,
                n_blocks=self.n_blocks,
                stochastic_depth_p=self.stochastic_depth_p,
                use_stochastic_depth=self.use_stochastic_depth,
                name="blocks",
            )
            x, _ = scanned(
                x, jnp.arange(self.n_blocks, dtype=jnp.float32), mask,
                deterministic,
            )
            return x  # (B, T', encoder_dim)

        block_cls = (
            nn.remat(ConformerBlock, static_argnums=(3,))
            if self.remat
            else ConformerBlock
        )
        for i in range(self.n_blocks):
            block = block_cls(**block_conf, name=f"block_{i}")
            y = block(x, mask, deterministic)
            if self.use_stochastic_depth and not deterministic:
                # survival prob p_i = 1 - ((i+1)/N)(1 - p)  (conformer.py:461-465);
                # whole-batch keep/skip decided from the PRNG stream — both
                # branches are in the traced graph, selection via where.
                p_i = 1.0 - ((i + 1) / self.n_blocks) * (1.0 - self.stochastic_depth_p)
                keep = jax.random.bernoulli(
                    self.make_rng("stochastic_depth"), p_i
                )
                x = jnp.where(keep, y, x)
            else:
                x = y
        return x  # (B, T', encoder_dim)


class FBankLayer(nn.Module):
    """In-model feature layer: wav → dB-mel (+ TimeStretch/SpecAugment when
    training) (reference FBank, conformer.py:262-325 + spectrogram_augment,
    audio_processor.py:198-228).  Returns ((B, T, n_mels), frame lengths) —
    lengths are returned because TimeStretch rescales them."""

    sample_rate: int = 16000
    win_len: float = 0.025
    hop_length: float = 0.01
    n_mels: int = 80
    t_mask_prob: float = 0.05
    f_mask: int = 27
    mask_times: int = 2
    t_stretch: bool = False

    @nn.compact
    def __call__(
        self,
        wav: jax.Array,  # (B, T)
        lengths: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        key = (
            self.make_rng("specaug")
            if not deterministic and (self.mask_times > 0 or self.t_stretch)
            else None
        )
        feats, f_len = F.fused_frontend(
            wav, lengths,
            key=key,
            sample_rate=self.sample_rate,
            n_mels=self.n_mels,
            win_length=self.win_len,
            hop_length=self.hop_length,
            normalize=False,  # reference FBank gets pre-normalized wavs
            t_stretch=self.t_stretch,
            mask_times=self.mask_times,
            t_mask_ratio=self.t_mask_prob,
            f_mask=self.f_mask,
        )
        return feats, f_len


# ---------------------------------------------------------------------------
# torch → flax checkpoint conversion (reference lid/conformer.py state_dicts)
# ---------------------------------------------------------------------------


def _np(v):
    import numpy as np

    # copy, never view: torch .numpy() aliases the tensor's storage, and a
    # later in-place torch update (BN running stats, optimizer steps) would
    # silently mutate the converted flax tree
    return np.array(v)


def convert_conformer_block_state(sd: dict, prefix: str) -> Tuple[dict, dict]:
    """One reference ``ConformerBlock`` (lid/conformer.py:211-259) state
    slice → (flax params subtree, batch_stats subtree) for our
    :class:`ConformerBlock`.

    torch layout (names produced by the reference's Sequential/PreNorm/Scale
    wrappers): ``ff1.fn.norm`` pre-LN, ``ff1.fn.fn.net.{0,3}`` the two
    Linears, ``attn.norm`` + ``attn.fn.{to_q,to_kv,to_out,rel_pos_emb}``,
    ``conv.net.{0 LN, 2 pointwise-in, 4.conv depthwise, 5 BN,
    7 pointwise-out}``, ``ff2.*`` like ff1, ``post_norm``.
    """
    import numpy as np

    def lin(name):  # torch Linear → flax Dense
        return {
            "kernel": _np(sd[prefix + name + ".weight"]).T,
            "bias": _np(sd[prefix + name + ".bias"]),
        }

    def ln(name):
        return {
            "scale": _np(sd[prefix + name + ".weight"]),
            "bias": _np(sd[prefix + name + ".bias"]),
        }

    def pointwise(name):  # torch Conv1d k=1 → flax Dense
        w = _np(sd[prefix + name + ".weight"])  # (O, I, 1)
        return {
            "kernel": w[:, :, 0].T,
            "bias": _np(sd[prefix + name + ".bias"]),
        }

    params = {
        "LayerNorm_0": ln("ff1.fn.norm"),
        "ff1": {"Dense_0": lin("ff1.fn.fn.net.0"),
                "Dense_1": lin("ff1.fn.fn.net.3")},
        "LayerNorm_1": ln("attn.norm"),
        "attn": {
            "to_q": {"kernel": _np(sd[prefix + "attn.fn.to_q.weight"]).T},
            "to_kv": {"kernel": _np(sd[prefix + "attn.fn.to_kv.weight"]).T},
            "to_out": lin("attn.fn.to_out"),
            "rel_pos_emb": _np(sd[prefix + "attn.fn.rel_pos_emb.weight"]),
        },
        "conv": {
            "LayerNorm_0": ln("conv.net.0"),
            "Dense_0": pointwise("conv.net.2"),
            "depthwise": {
                # torch depthwise Conv1d weight (C, 1, K) → flax grouped
                # nn.Conv kernel (K, 1, C)
                "kernel": np.transpose(
                    _np(sd[prefix + "conv.net.4.conv.weight"]), (2, 1, 0)
                ),
                "bias": _np(sd[prefix + "conv.net.4.conv.bias"]),
            },
            "bn": {
                "scale": _np(sd[prefix + "conv.net.5.weight"]),
                "bias": _np(sd[prefix + "conv.net.5.bias"]),
            },
            "Dense_1": pointwise("conv.net.7"),
        },
        "LayerNorm_2": ln("ff2.fn.norm"),
        "ff2": {"Dense_0": lin("ff2.fn.fn.net.0"),
                "Dense_1": lin("ff2.fn.fn.net.3")},
        "post_norm": ln("post_norm"),
    }
    batch_stats = {
        "conv": {
            "bn": {
                "mean": _np(sd[prefix + "conv.net.5.running_mean"]),
                "var": _np(sd[prefix + "conv.net.5.running_var"]),
            }
        }
    }
    return params, batch_stats


def convert_conformer_state(
    torch_state: dict,
    n_blocks: int,
    sub_sampling: int = 2,
    prefix: str = "",
) -> dict:
    """Reference ``ConformerModel`` state_dict (numpy-converted) → flax
    variables ``{"params": …, "batch_stats": …}`` for our unrolled
    :class:`ConformerModel`.

    The reference's unused ``linear`` module (constructed but never called,
    lid/conformer.py:428,452) and the buffer-less positional encoder are
    skipped.
    """
    import numpy as np

    sd = {k: _np(v) for k, v in torch_state.items()}
    params: dict = {}
    stats: dict = {}
    if sub_sampling == 4:
        w0 = sd[prefix + "sub_sampling.conv.0.weight"]  # (O, 1, 3, 3)
        w2 = sd[prefix + "sub_sampling.conv.2.weight"]  # (O, O, 3, 3)
        odim = w0.shape[0]
        out_w = sd[prefix + "sub_sampling.out.weight"]  # (O, C*F)
        f_dim = out_w.shape[1] // odim
        # torch flattens (B,T,C,F) channel-major (torch row j ↔ c=j//F,
        # f=j%F); ours flattens (B,T,F,C) freq-major (our row = f*C + c).
        # argsort of the our-row index per torch row = for each our row,
        # the torch row that feeds it.
        j = np.arange(out_w.shape[1])
        c, f = j // f_dim, j % f_dim
        params["subsample"] = {
            "Conv_0": {"kernel": np.transpose(w0, (2, 3, 1, 0)),
                       "bias": sd[prefix + "sub_sampling.conv.0.bias"]},
            "Conv_1": {"kernel": np.transpose(w2, (2, 3, 1, 0)),
                       "bias": sd[prefix + "sub_sampling.conv.2.bias"]},
            "Dense_0": {
                "kernel": out_w.T[np.argsort(f * odim + c)],
                "bias": sd[prefix + "sub_sampling.out.bias"],
            },
        }
    else:
        w = sd[prefix + "sub_sampling.sub_sampling.0.weight"]  # (I, I, 3)
        params["subsample"] = {
            "Conv_0": {"kernel": np.transpose(w, (2, 1, 0)),
                       "bias": sd[prefix + "sub_sampling.sub_sampling.0.bias"]},
            "Dense_0": {
                "kernel": sd[prefix + "sub_sampling.linear.weight"].T,
                "bias": sd[prefix + "sub_sampling.linear.bias"],
            },
        }
    for i in range(n_blocks):
        bp, bs = convert_conformer_block_state(sd, f"{prefix}encoders.{i}.")
        params[f"block_{i}"] = bp
        stats[f"block_{i}"] = bs
    return {"params": params, "batch_stats": stats}

"""WavLM SSL upstream encoder (flax), with torch-checkpoint conversion.

From-scratch JAX rebuild of Microsoft WavLM as vendored by the reference
(lid/wavlm/WavLM.py, lid/wavlm/modules.py):

- 7-layer conv waveform extractor, 320× downsample, fp32 GroupNorm island
  after the first conv in "default" mode (WavLM.py:409-531);
- post-extract LayerNorm → 512→768 projection → optional span/channel
  masking with a learned mask embedding (WavLM.py:35-158, :299-338);
- transformer encoder with weight-normed conv positional embedding (k=128,
  16 groups, SamePad trim, WavLM.py:540-549) and **gated relative position
  bias**: T5-style bidirectional buckets (320/1280) embedded per head at
  layer 0 and shared down the stack, modulated per query by
  ``g = gate_a·(gate_b·grep_a − 1) + 2`` (modules.py:414-529);
- per-layer outputs retained for the s3prl-style weighted-sum Featurizer.

Numerical parity with the reference torch implementation is enforced by
tests/test_wavlm.py (random-init torch model → convert → compare).

TPU-first notes: everything is batch-first (the torch original shuffles
T×B×C), static shapes with explicit sample lengths, masking driven by jax
PRNG (statistical, not bitwise, equivalence — SURVEY.md §7.3.3).
"""

from __future__ import annotations

import ast
import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speechlid_tpu.ops.quant import quant_dot_general


def _eval_conv_spec(spec: str) -> List[Tuple[int, int, int]]:
    """Safely evaluate conv-layer specs like
    "[(512,10,5)] + [(512,3,2)] * 4" (the checkpoint format the reference
    ``eval``s at WavLM.py:256) — only list/tuple literals, +, * allowed."""

    def walk(node):
        if isinstance(node, ast.Expression):
            return walk(node.body)
        if isinstance(node, (ast.List, ast.Tuple)):
            out = [walk(e) for e in node.elts]
            return tuple(out) if isinstance(node, ast.Tuple) else out
        if isinstance(node, ast.Constant) and isinstance(node.value, int):
            return node.value
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Add):
            return walk(node.left) + walk(node.right)
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Mult):
            return walk(node.left) * walk(node.right)
        raise ValueError(f"unsupported conv spec node: {ast.dump(node)}")

    return list(walk(ast.parse(spec, mode="eval")))


@dataclass(frozen=True)
class WavLMConfig:
    extractor_mode: str = "default"  # or "layer_norm"
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    activation_fn: str = "gelu"
    layer_norm_first: bool = False
    conv_feature_layers: str = "[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2"
    conv_bias: bool = False
    feature_grad_mult: float = 1.0
    normalize: bool = False
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    encoder_layerdrop: float = 0.0
    dropout_input: float = 0.0
    dropout_features: float = 0.0
    mask_length: int = 10
    mask_prob: float = 0.65
    mask_channel_length: int = 10
    mask_channel_prob: float = 0.0
    conv_pos: int = 128
    conv_pos_groups: int = 16
    relative_position_embedding: bool = False
    num_buckets: int = 320
    max_distance: int = 1280
    gru_rel_pos: bool = False
    # compute dtype for matmuls/convs (params stay f32; norms + softmax are
    # pinned f32 islands per the reference's Fp32LayerNorm/Fp32GroupNorm —
    # modules.py:41-74 — which is also the stable TPU mixed-precision recipe)
    dtype: Any = jnp.float32
    # dynamic int8 W8A8 serving path for the encoder-layer projections
    # (q/k/v/out + fc1/fc2 — ~97 % of encoder dense FLOPs): 'int8' or
    # 'int8_ste' (ops/quant.py).  The MXU runs s8×s8→s32 at ~2× bf16 rate.
    quant_dot: Optional[str] = None
    # conv extractor lowering: 'conv' (lax conv) or 'matmul' (im2col framed
    # GEMM — strided slices + one MXU matmul per layer; k=s layers are a
    # pure reshape).  The extractor is 28 % of flagship inference time at
    # only ~58 TF sustained (docs/runs/CHIP_FINDINGS_r3.md decomposition);
    # the framed form hits the GEMM path directly and honors quant_dot.
    conv_extractor_impl: str = "conv"

    @property
    def conv_layers(self) -> List[Tuple[int, int, int]]:
        return _eval_conv_spec(self.conv_feature_layers)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "WavLMConfig":
        names = {f.name for f in __import__("dataclasses").fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


def conv_out_lengths(
    lengths: jax.Array, conv_layers: Sequence[Tuple[int, int, int]]
) -> jax.Array:
    for _, k, s in conv_layers:
        lengths = (lengths - k) // s + 1
    return lengths


class _FramedConv(nn.Module):
    """VALID strided conv1d as an explicit framed matmul: k strided slices
    concatenated tap-major → ONE (B·T', k·Cin)×(k·Cin, Cout) GEMM.  Param
    tree identical to ``nn.Conv`` (kernel (k, Cin, Cout) [+ bias]), so
    checkpoints are interchangeable with the 'conv' lowering; non-
    overlapping layers (k == s) reduce to a reshape.  Honors ``quant_dot``
    — this is how the conv extractor rides the int8 MXU path."""

    features: int
    kernel_size: int
    stride: int
    use_bias: bool = False
    dtype: Any = jnp.float32
    quant_dot: Optional[str] = None

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:  # (B, T, Cin)
        b, t, cin = y.shape
        k, s = self.kernel_size, self.stride
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, cin, self.features), jnp.float32,
        )
        t2 = (t - k) // s + 1
        if k == s:
            win = y[:, : t2 * s, :].reshape(b, t2, k * cin)
        else:
            win = jnp.concatenate(
                [y[:, i : i + (t2 - 1) * s + 1 : s, :] for i in range(k)],
                axis=-1,
            )  # (B, T2, k·Cin) tap-major — matches kernel.reshape below
        w = kernel.reshape(k * cin, self.features).astype(self.dtype)
        dot = quant_dot_general(self.quant_dot) or jax.lax.dot_general
        out = dot(
            win.astype(self.dtype), w, (((2,), (0,)), ((), ())),
            None, None,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            out = out + bias.astype(self.dtype)
        return out


class ConvFeatureExtractor(nn.Module):
    """Waveform (B, T) → (B, T', C) conv stack (WavLM.py:409-531)."""

    config: WavLMConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        y = x[:, :, None]  # (B, T, 1) NWC
        for i, (dim, k, stride) in enumerate(cfg.conv_layers):
            if cfg.conv_extractor_impl == "matmul":
                y = _FramedConv(
                    dim, k, stride, use_bias=cfg.conv_bias,
                    dtype=cfg.dtype, quant_dot=cfg.quant_dot,
                    name=f"conv_{i}",
                )(y)
            else:
                y = nn.Conv(
                    dim, (k,), strides=(stride,), padding="VALID",
                    use_bias=cfg.conv_bias, name=f"conv_{i}", dtype=cfg.dtype,
                )(y)
            if cfg.extractor_mode == "layer_norm":
                # fp32 LayerNorm over channels
                y = nn.LayerNorm(epsilon=1e-5, name=f"ln_{i}", dtype=jnp.float32)(y)
            elif i == 0:
                # fp32 GroupNorm(dim groups, dim channels) == per-channel
                # norm over time, affine (Fp32GroupNorm island)
                y = nn.GroupNorm(
                    num_groups=dim, epsilon=1e-5, name="gn_0",
                    dtype=jnp.float32,
                )(y)
            y = jax.nn.gelu(y, approximate=False)
        return y


def _relative_positions_bucket(
    relative_positions: jax.Array, num_buckets: int, max_distance: int
) -> jax.Array:
    """T5 bidirectional bucketing (modules.py:414-439)."""
    nb = num_buckets // 2
    buckets = (relative_positions > 0).astype(jnp.int32) * nb
    rel = jnp.abs(relative_positions)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        jnp.log(rel.astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return buckets + jnp.where(is_small, rel, large)


class RelPosMultiheadAttention(nn.Module):
    """Self-attention with optional (gated) relative position bias
    (modules.py:301-560).  Batch-first (B, T, C)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    has_relative_attention_bias: bool = False
    num_buckets: int = 320
    max_distance: int = 1280
    gru_rel_pos: bool = False
    dtype: Any = jnp.float32
    quant_dot: Optional[str] = None  # int8 q/k/v/out projections; the
    # attention einsums and grep gate (tiny, gate-sensitive) stay real

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        padding_mask: Optional[jax.Array] = None,  # (B, T) True = PAD
        position_bias: Optional[jax.Array] = None,  # (H, T, T)
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        b, t, c = x.shape
        h = self.num_heads
        d = c // h
        scaling = d**-0.5

        dg = quant_dot_general(self.quant_dot)
        q = nn.Dense(c, name="q_proj", dtype=self.dtype, dot_general=dg)(x) * scaling
        k = nn.Dense(c, name="k_proj", dtype=self.dtype, dot_general=dg)(x)
        v = nn.Dense(c, name="v_proj", dtype=self.dtype, dot_general=dg)(x)
        q = q.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, d).transpose(0, 2, 1, 3)

        if self.has_relative_attention_bias and position_bias is None:
            rel_emb = self.param(
                "relative_attention_bias",
                nn.initializers.normal(1.0),
                (self.num_buckets, h),
            )
            pos = jnp.arange(t)
            rel = pos[None, :] - pos[:, None]  # memory - context
            bucket = _relative_positions_bucket(
                rel, self.num_buckets, self.max_distance
            )
            position_bias = jnp.take(rel_emb, bucket, axis=0)  # (T, T, H)
            position_bias = jnp.transpose(position_bias, (2, 0, 1))  # (H,T,T)

        attn_bias = None
        if position_bias is not None:
            attn_bias = jnp.broadcast_to(
                position_bias[None], (b, h, t, t)
            )
            if self.gru_rel_pos:
                # gate computed from the PRE-projection input per head
                # (modules.py:521-529)
                query_layer = x.reshape(b, t, h, d).transpose(0, 2, 1, 3)
                grep = nn.Dense(8, name="grep_linear", dtype=self.dtype)(
                    query_layer
                )
                grep = grep.reshape(b, h, t, 2, 4).sum(-1)
                gates = jax.nn.sigmoid(grep)  # (B,H,T,2)
                gate_a, gate_b = gates[..., 0:1], gates[..., 1:2]
                grep_a = self.param(
                    "grep_a", nn.initializers.ones, (1, h, 1, 1)
                )
                # gate_a/gate_b: (B,H,T,1); grep_a broadcasts over (B, T)
                gate_a_1 = gate_a * (gate_b * grep_a - 1.0) + 2.0
                attn_bias = gate_a_1 * attn_bias  # (B,H,T,1)*(B,H,T,T)

        # attention logits accumulate in f32 on the MXU (softmax island)
        weights = jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        )
        if attn_bias is not None:
            weights = weights + attn_bias
        if padding_mask is not None:
            weights = jnp.where(
                padding_mask[:, None, None, :],
                jnp.finfo(jnp.float32).min,
                weights,
            )
        probs = jax.nn.softmax(weights, axis=-1).astype(q.dtype)
        probs = nn.Dropout(self.dropout, deterministic=deterministic)(probs)
        out = jnp.einsum("bhij,bhjd->bhid", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
        out = nn.Dense(c, name="out_proj", dtype=self.dtype,
                       dot_general=dg)(out)
        return out, position_bias


def _ffn_act(cfg: WavLMConfig, y: jax.Array, dense_out: int, name: str):
    """fc1 + activation: gelu (default) or GLU_Linear with swish gate
    (reference modules.py GLU_Linear, used when activation_fn == 'glu')."""
    dg = quant_dot_general(cfg.quant_dot)
    if cfg.activation_fn == "glu":
        z = nn.Dense(2 * dense_out, name=name, dtype=cfg.dtype,
                     dot_general=dg)(y)
        a, g = jnp.split(z, 2, axis=-1)
        return a * (g * jax.nn.sigmoid(g))  # swish-gated GLU
    return jax.nn.gelu(
        nn.Dense(dense_out, name=name, dtype=cfg.dtype, dot_general=dg)(y),
        approximate=False,
    )


class WavLMEncoderLayer(nn.Module):
    """Post-/pre-LN transformer layer (WavLM.py:651-778)."""

    config: WavLMConfig
    has_relative_attention_bias: bool = False

    @nn.compact
    def __call__(
        self, x, padding_mask=None, position_bias=None, deterministic=True
    ):
        cfg = self.config
        attn = RelPosMultiheadAttention(
            cfg.encoder_embed_dim,
            cfg.encoder_attention_heads,
            dropout=cfg.attention_dropout,
            has_relative_attention_bias=self.has_relative_attention_bias,
            num_buckets=cfg.num_buckets,
            max_distance=cfg.max_distance,
            gru_rel_pos=cfg.gru_rel_pos,
            dtype=cfg.dtype,
            quant_dot=cfg.quant_dot,
            name="self_attn",
        )
        drop = lambda z: nn.Dropout(cfg.dropout, deterministic=deterministic)(z)
        act_drop = lambda z: nn.Dropout(
            cfg.activation_dropout, deterministic=deterministic
        )(z)

        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5, name=name, dtype=jnp.float32
        )
        residual = x
        if cfg.layer_norm_first:
            y = ln("self_attn_layer_norm")(x)
            y, position_bias = attn(
                y, padding_mask, position_bias, deterministic
            )
            x = residual + drop(y)
            residual = x
            y = ln("final_layer_norm")(x)
            y = _ffn_act(cfg, y, cfg.encoder_ffn_embed_dim, "fc1")
            y = act_drop(y)
            y = nn.Dense(cfg.encoder_embed_dim, name="fc2", dtype=cfg.dtype)(y)
            x = residual + drop(y)
        else:
            y, position_bias = attn(
                x, padding_mask, position_bias, deterministic
            )
            x = residual + drop(y)
            x = ln("self_attn_layer_norm")(x)
            residual = x
            y = _ffn_act(cfg, x, cfg.encoder_ffn_embed_dim, "fc1")
            y = act_drop(y)
            y = nn.Dense(cfg.encoder_embed_dim, name="fc2", dtype=cfg.dtype)(y)
            x = residual + drop(y)
            x = ln("final_layer_norm")(x)
        return x, position_bias


class _WavLMLayerStep(nn.Module):
    """One nn.scan step over the uniform encoder layers (1..N-1; layer 0
    owns the relative-attention bias table and stays unrolled).  The
    attention returns the UNGATED shared position bias, so broadcasting
    layer 0's bias into the scan is exact — per-layer gru_rel_pos gates
    live inside each scanned layer's params.  Emits the layer output as
    the scan ``y`` so per-layer results (Featurizer weighted sum) fall
    out stacked."""

    config: WavLMConfig

    @nn.compact
    def __call__(self, carry, attn_mask, position_bias, deterministic):
        x = carry
        y, _ = WavLMEncoderLayer(
            self.config, has_relative_attention_bias=False
        )(x, attn_mask, position_bias, deterministic)
        cfg = self.config
        if cfg.encoder_layerdrop > 0 and not deterministic:
            keep = jax.random.bernoulli(
                self.make_rng("layerdrop"), 1.0 - cfg.encoder_layerdrop
            )
            y = jnp.where(keep, y, x)
        return y, y


class _WeightNormConvPos(nn.Module):
    """Conv positional embedding with weight normalization along dim=2
    (kernel-length axis in torch (O, I/g, K) layout; WavLM.py:540-549).
    Parameters stored as (g, v) so torch checkpoints map 1:1."""

    config: WavLMConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, C)
        cfg = self.config
        c = cfg.encoder_embed_dim
        k = cfg.conv_pos
        g = cfg.conv_pos_groups
        # torch layout (O, I/g, K)
        v = self.param(
            "weight_v",
            nn.initializers.normal(
                math.sqrt(4.0 / (k * c))
            ),
            (c, c // g, k),
        )
        # torch weight_norm(dim=2): one scalar per kernel position, norm
        # taken over (out, in) dims — g shape (1, 1, K)
        gscale = self.param(
            "weight_g", nn.initializers.ones, (1, 1, k)
        )
        bias = self.param("bias", nn.initializers.zeros, (c,))
        # weight_norm with dim=2: normalize over dims (0, 1) per k-slice
        norm = jnp.sqrt(jnp.sum(v**2, axis=(0, 1), keepdims=True) + 1e-12)
        w = v / norm * gscale  # broadcast (c, c/g, k)
        # flax NWC kernel layout: (K, I/g, O)
        kernel = jnp.transpose(w, (2, 1, 0)).astype(cfg.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(cfg.dtype),
            kernel,
            window_strides=(1,),
            padding=[(k // 2, k // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=g,
        ) + bias.astype(cfg.dtype)
        if k % 2 == 0:  # SamePad: drop trailing frame for even kernels
            y = y[:, :-1, :]
        return jax.nn.gelu(y, approximate=False)


def compute_mask_spans(
    key: jax.Array,
    batch: int,
    seq_len: int,
    mask_prob: float,
    mask_length: int,
    min_masks: int = 2,
    lengths: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, T) boolean span mask — jit-friendly rework of fairseq
    compute_mask_indices 'static' selection (WavLM.py:35-158): per item,
    ``floor(prob·T/L + u)`` spans of fixed length at random starts (with
    overlap, like the reference's default no_overlap=False).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    t_eff = (
        jnp.full((batch,), seq_len, jnp.float32)
        if lengths is None
        else lengths.astype(jnp.float32)
    )
    num_mask = jnp.floor(
        mask_prob * t_eff / mask_length
        + jax.random.uniform(k1, (batch,))
    ).astype(jnp.int32)
    num_mask = jnp.maximum(num_mask, min_masks)
    max_masks = int(mask_prob * seq_len / mask_length) + min_masks + 1
    # random starts in [0, len - mask_length)
    span_start = (
        jax.random.uniform(k2, (batch, max_masks))
        * jnp.maximum(t_eff[:, None] - mask_length, 1.0)
    ).astype(jnp.int32)
    active = jnp.arange(max_masks)[None, :] < num_mask[:, None]
    pos = jnp.arange(seq_len)[None, None, :]
    in_span = (
        (pos >= span_start[:, :, None])
        & (pos < span_start[:, :, None] + mask_length)
        & active[:, :, None]
    )
    mask = jnp.any(in_span, axis=1)
    if lengths is not None:
        mask = mask & (jnp.arange(seq_len)[None, :] < lengths[:, None])
    return mask


class WavLM(nn.Module):
    """Full WavLM (WavLM.py:247-406).  ``__call__`` == extract_features.

    ``mask_attention=False`` reproduces the reference's *call path* exactly:
    the encoder never sees the padding mask at all (WavLM.extract_features
    comments it out, WavLM.py:392-393), so padded frames are neither zeroed
    nor excluded from attention — they carry conv-extractor outputs of the
    zero-padded waveform.  ``mask_attention=True`` zeroes padded frames
    before the positional conv and masks attention keys (better behavior,
    not bit-parity).  ``feat_len`` from conv arithmetic is returned either
    way for downstream CTC/pooling masks.
    """

    config: WavLMConfig
    mask_attention: bool = False
    # rematerialize each encoder layer in the backward pass: trades ~30%
    # extra FLOPs for not keeping the O(B·H·T²) gated-bias attention
    # intermediates alive across the whole stack — required for long
    # sequences / low-downsample configs (found via a 35 GB OOM, see
    # tests/verify notes)
    remat: bool = False
    # nn.scan layers 1..N-1 (layer 0 stays unrolled — it owns the shared
    # relative-attention bias table): ONE traced layer instead of N-1, so
    # compile time and serialized-HLO size are O(1) in depth — multi-minute
    # remote compiles and the POST /remote_compile body limit both shrink.
    # Param layout differs (layers_rest stacked); convert unrolled weights
    # with :func:`stack_scan_layers`.  Numerics identical (tests).
    scan_layers: bool = False
    # lax.scan unroll factor for the scanned layers: >1 puts `unroll`
    # copies of the body in each loop iteration, restoring the cross-layer
    # fusion XLA cannot do across scan iterations, while keeping
    # compile/HLO size ~unroll/(N-1) of the fully unrolled build — the
    # middle ground probed for the round-3 "scan runtime 3x" finding
    scan_unroll: int = 1

    def feat_lengths(self, sample_lengths: jax.Array) -> jax.Array:
        return conv_out_lengths(sample_lengths, self.config.conv_layers)

    @nn.compact
    def __call__(
        self,
        source: jax.Array,  # (B, T) waveform
        lengths: Optional[jax.Array] = None,  # samples
        mask: bool = False,
        ret_layer_results: bool = False,
        deterministic: bool = True,
    ):
        cfg = self.config
        if cfg.normalize:
            mean = jnp.mean(source, axis=-1, keepdims=True)
            var = jnp.var(source, axis=-1, keepdims=True)
            source = (source - mean) / jnp.sqrt(var + 1e-5)
        features = ConvFeatureExtractor(cfg, name="feature_extractor")(source)
        if cfg.feature_grad_mult == 0.0:
            features = jax.lax.stop_gradient(features)
        elif cfg.feature_grad_mult != 1.0:
            gm = cfg.feature_grad_mult
            features = (
                jax.lax.stop_gradient(features) * (1.0 - gm) + features * gm
            )
        features = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(features)

        feat_len = None
        pad_mask = None
        if lengths is not None:
            feat_len = self.feat_lengths(lengths)
            if self.mask_attention:
                pad_mask = (
                    jnp.arange(features.shape[1])[None, :]
                    >= feat_len[:, None]
                )

        embed = cfg.conv_layers[-1][0]
        if embed != cfg.encoder_embed_dim:
            features = nn.Dense(
                cfg.encoder_embed_dim, name="post_extract_proj",
                dtype=cfg.dtype,
            )(features)
        features = nn.Dropout(
            cfg.dropout_input, deterministic=deterministic
        )(features)

        x = features
        # created unconditionally so init (which runs unmasked) still
        # materializes the parameter used by masked training steps
        mask_emb = self.param(
            "mask_emb",
            nn.initializers.uniform(1.0),
            (cfg.encoder_embed_dim,),
        )
        if mask and cfg.mask_prob > 0:
            spans = compute_mask_spans(
                self.make_rng("mask"),
                x.shape[0], x.shape[1],
                cfg.mask_prob, cfg.mask_length,
                lengths=feat_len,
            )
            x = jnp.where(
                spans[:, :, None],
                mask_emb[None, None, :].astype(x.dtype),
                x,
            )
        if mask and cfg.mask_channel_prob > 0:
            ch = compute_mask_spans(
                self.make_rng("mask_channel"),
                x.shape[0], x.shape[2],
                cfg.mask_channel_prob, cfg.mask_channel_length,
                min_masks=0,
            )
            x = jnp.where(ch[:, None, :], 0.0, x)

        # ----- transformer encoder (WavLM.py:534-648)
        if pad_mask is not None:
            x = jnp.where(pad_mask[:, :, None], 0.0, x)
        attn_mask = pad_mask if self.mask_attention else None
        x = x + _WeightNormConvPos(cfg, name="pos_conv")(x)
        if not cfg.layer_norm_first:
            x = nn.LayerNorm(epsilon=1e-5, name="encoder_layer_norm")(x)
        x = nn.Dropout(cfg.dropout, deterministic=deterministic)(x)

        layer_results = [x]
        position_bias = None
        layer_cls = (
            # arg 4 == deterministic (0 is self in flax's remat indexing)
            nn.remat(WavLMEncoderLayer, static_argnums=(4,))
            if self.remat
            else WavLMEncoderLayer
        )
        if self.scan_layers and cfg.encoder_layers > 1:
            layer0 = layer_cls(
                cfg,
                has_relative_attention_bias=cfg.relative_position_embedding,
                name="layers_0",
            )
            y, position_bias = layer0(x, attn_mask, None, deterministic)
            if cfg.encoder_layerdrop > 0 and not deterministic:
                keep = jax.random.bernoulli(
                    self.make_rng("layerdrop"), 1.0 - cfg.encoder_layerdrop
                )
                y = jnp.where(keep, y, x)
            x = y
            layer_results.append(x)
            step_cls = (
                nn.remat(_WavLMLayerStep, static_argnums=(4,))
                if self.remat else _WavLMLayerStep
            )
            scanned = nn.scan(
                step_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True,
                            "layerdrop": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=cfg.encoder_layers - 1,
                unroll=min(self.scan_unroll, cfg.encoder_layers - 1),
            )(cfg, name="layers_rest")
            x, ys = scanned(x, attn_mask, position_bias, deterministic)
            if ret_layer_results:
                layer_results.extend(ys[i] for i in range(ys.shape[0]))
            if cfg.layer_norm_first:
                x = nn.LayerNorm(epsilon=1e-5, name="encoder_layer_norm")(x)
            if ret_layer_results:
                return x, feat_len, layer_results
            return x, feat_len
        for i in range(cfg.encoder_layers):
            layer = layer_cls(
                cfg,
                has_relative_attention_bias=(
                    cfg.relative_position_embedding and i == 0
                ),
                name=f"layers_{i}",
            )
            if cfg.encoder_layerdrop > 0 and not deterministic:
                keep = jax.random.bernoulli(
                    self.make_rng("layerdrop"), 1.0 - cfg.encoder_layerdrop
                )
                y, position_bias = layer(
                    x, attn_mask, position_bias, deterministic
                )
                x = jnp.where(keep, y, x)
            else:
                x, position_bias = layer(
                    x, attn_mask, position_bias, deterministic
                )
            layer_results.append(x)
        if cfg.layer_norm_first:
            x = nn.LayerNorm(epsilon=1e-5, name="encoder_layer_norm")(x)

        if ret_layer_results:
            return x, feat_len, layer_results
        return x, feat_len


class WavLMModel(nn.Module):
    """Reference wrapper (lid/wavlm/example.py WavLMModel): pretrained
    upstream with mask-prob overrides, (B, T) → (B, T', 768) last layer or
    all layers.  Masking only when training (example.py:43)."""

    config: WavLMConfig
    remat: bool = False
    scan_layers: bool = False
    scan_unroll: int = 1

    def subsampled_lengths(self, lengths: jax.Array) -> jax.Array:
        return conv_out_lengths(lengths, self.config.conv_layers)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        lengths: Optional[jax.Array] = None,
        only_last: bool = True,
        deterministic: bool = True,
    ):
        out = WavLM(self.config, remat=self.remat,
                    scan_layers=self.scan_layers,
                    scan_unroll=self.scan_unroll, name="wavlm")(
            x, lengths,
            mask=not deterministic,
            ret_layer_results=not only_last,
            deterministic=deterministic,
        )
        if only_last:
            feats, _ = out
            return feats
        feats, _, layer_results = out
        return jnp.stack(layer_results, axis=0)  # (L+1, B, T, C)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def stack_scan_layers(params: Dict) -> Dict:
    """Unrolled WavLM params (``layers_1..layers_{N-1}``) → the
    ``scan_layers=True`` layout (``layers_rest`` with a leading layer
    axis).  ``layers_0`` and everything else pass through, so torch
    checkpoints convert via :func:`convert_wavlm_state` then this."""
    import jax

    rest = sorted(
        (k for k in params if k.startswith("layers_") and
         k.rsplit("_", 1)[-1].isdigit() and int(k.rsplit("_", 1)[-1]) > 0),
        key=lambda k: int(k.rsplit("_", 1)[-1]),
    )
    if not rest:
        return params
    out = {k: v for k, v in params.items() if k not in rest}
    out["layers_rest"] = {"WavLMEncoderLayer_0": jax.tree_util.tree_map(
        lambda *ls: jnp.stack([jnp.asarray(l) for l in ls]),
        *[params[k] for k in rest],
    )}
    return out


def convert_wavlm_state(
    torch_state: Dict[str, "np.ndarray"], cfg: WavLMConfig
) -> Dict:
    """Map a torch WavLM state_dict (numpy-converted) → flax params for
    :class:`WavLM`.  Replaces the fairseq checkpoint loader
    (lid/s3prl_updream inventory row, SURVEY.md §2.4)."""

    sd = {k: np.array(v) for k, v in torch_state.items()}  # copy: torch .numpy() views
    p: Dict[str, Any] = {}

    def put(path: str, value: np.ndarray):
        node = p
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)

    # conv extractor
    for i, (dim, k, s) in enumerate(cfg.conv_layers):
        w = sd[f"feature_extractor.conv_layers.{i}.0.weight"]  # (O, I, K)
        put(
            f"feature_extractor/conv_{i}/kernel", np.transpose(w, (2, 1, 0))
        )
        if cfg.conv_bias:
            put(
                f"feature_extractor/conv_{i}/bias",
                sd[f"feature_extractor.conv_layers.{i}.0.bias"],
            )
        if cfg.extractor_mode == "layer_norm":
            put(f"feature_extractor/ln_{i}/scale",
                sd[f"feature_extractor.conv_layers.{i}.2.1.weight"])
            put(f"feature_extractor/ln_{i}/bias",
                sd[f"feature_extractor.conv_layers.{i}.2.1.bias"])
        elif i == 0:
            put("feature_extractor/gn_0/scale",
                sd["feature_extractor.conv_layers.0.2.weight"])
            put("feature_extractor/gn_0/bias",
                sd["feature_extractor.conv_layers.0.2.bias"])

    put("layer_norm/scale", sd["layer_norm.weight"])
    put("layer_norm/bias", sd["layer_norm.bias"])
    if "post_extract_proj.weight" in sd:
        put("post_extract_proj/kernel", sd["post_extract_proj.weight"].T)
        put("post_extract_proj/bias", sd["post_extract_proj.bias"])
    if "mask_emb" in sd:
        put("mask_emb", sd["mask_emb"])

    # pos conv (weight-normed; torch ≥2 may store parametrized names)
    def _wn(name_g, name_v, legacy_prefix="encoder.pos_conv.0"):
        if name_g in sd:
            return sd[name_g], sd[name_v]
        return (
            sd[f"{legacy_prefix}.weight_g"],
            sd[f"{legacy_prefix}.weight_v"],
        )

    g, v = _wn(
        "encoder.pos_conv.0.parametrizations.weight.original0",
        "encoder.pos_conv.0.parametrizations.weight.original1",
    )
    put("pos_conv/weight_g", g)
    put("pos_conv/weight_v", v)
    put("pos_conv/bias", sd["encoder.pos_conv.0.bias"])

    put("encoder_layer_norm/scale", sd["encoder.layer_norm.weight"])
    put("encoder_layer_norm/bias", sd["encoder.layer_norm.bias"])

    for i in range(cfg.encoder_layers):
        tp = f"encoder.layers.{i}."
        fp = f"layers_{i}/"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put(f"{fp}self_attn/{proj}/kernel", sd[tp + f"self_attn.{proj}.weight"].T)
            put(f"{fp}self_attn/{proj}/bias", sd[tp + f"self_attn.{proj}.bias"])
        if tp + "self_attn.relative_attention_bias.weight" in sd:
            put(
                f"{fp}self_attn/relative_attention_bias",
                sd[tp + "self_attn.relative_attention_bias.weight"],
            )
        if tp + "self_attn.grep_linear.weight" in sd:
            put(f"{fp}self_attn/grep_linear/kernel",
                sd[tp + "self_attn.grep_linear.weight"].T)
            put(f"{fp}self_attn/grep_linear/bias",
                sd[tp + "self_attn.grep_linear.bias"])
            put(f"{fp}self_attn/grep_a", sd[tp + "self_attn.grep_a"])
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            put(f"{fp}{ln}/scale", sd[tp + f"{ln}.weight"])
            put(f"{fp}{ln}/bias", sd[tp + f"{ln}.bias"])
        for fc in ("fc1", "fc2"):
            put(f"{fp}{fc}/kernel", sd[tp + f"{fc}.weight"].T)
            put(f"{fp}{fc}/bias", sd[tp + f"{fc}.bias"])
    return p


def load_wavlm_checkpoint(pt_path: str) -> Tuple[Dict, WavLMConfig]:
    """Load a WavLM .pt checkpoint (torch pickle with 'cfg' and 'model') →
    (flax params for :class:`WavLM`, config).  Replaces
    lid/wavlm/example.py:20-33."""
    import torch

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    cfg = WavLMConfig.from_dict(ckpt["cfg"])
    state = {k: v.numpy() for k, v in ckpt["model"].items()}
    return convert_wavlm_state(state, cfg), cfg

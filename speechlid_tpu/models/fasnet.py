"""FaSNet-TAC: filter-and-sum network with transform-average-concatenate
for multi-channel speech enhancement/separation.

Reference: ``se/models/FaSNet.py`` (FaSNet_TAC:558-616, DPRNN_TAC:114-222,
BF_module:301-345, seg_signal_context:389-421, seq_cos_sim:423-453).

TPU-first design notes (vs the reference's CUDA/torch formulation):

- The reference computes per-chunk sliding correlations (cosine-similarity
  features and the filter-and-sum convolution) with ``F.conv1d`` using
  ``groups = batch*L`` — one kernel per group.  Giant-group convs map
  poorly to the MXU, and materializing the (G, filter_dim, window) frame
  tensor instead costs ~GBs of HBM.  Here both are ONE batched
  FFT correlation: ``irfft(rfft(ref) * conj(rfft(kernel)))`` — O(G·n log n)
  with O(G·n) memory, fully batched, no grouped conv.  Sliding L2 norms
  come from a cumulative-sum difference instead of a ones-kernel conv.
- Segmentation/overlap-add use static-shape gathers and scatter-adds
  (``.at[idx].add``) so the whole forward jit-compiles once; the
  reference's python-level ``rest > 0`` branches become static padding
  arithmetic on trace-time shapes.
- Variable mic counts (``num_mic``) use a channel mask + masked mean —
  jittable — instead of the reference's per-sample python loop.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# sliding-window primitives (shared by cosine features and filter-and-sum)
# ---------------------------------------------------------------------------


def sliding_corr(ref: jax.Array, kernel: jax.Array, out_len: int) -> jax.Array:
    """``out[..., k] = sum_j ref[..., k+j] * kernel[..., j]`` for
    ``k < out_len`` (valid cross-correlation, no kernel flip — torch
    ``F.conv1d`` semantics).  FFT-based; exact for
    ``out_len <= n - m + 1``."""
    n = ref.shape[-1]
    rf = jnp.fft.rfft(ref, n=n)
    kf = jnp.fft.rfft(kernel, n=n)
    corr = jnp.fft.irfft(rf * jnp.conj(kf), n=n)
    return corr[..., :out_len]


def sliding_sumsq(ref: jax.Array, m: int) -> jax.Array:
    """Sum of squares over every length-``m`` window: (..., n) →
    (..., n - m + 1), via cumsum difference."""
    sq = jnp.cumsum(ref.astype(jnp.float32) ** 2, axis=-1)
    sq = jnp.concatenate([jnp.zeros_like(sq[..., :1]), sq], axis=-1)
    # cumsum-difference roundoff can dip below zero → NaN under sqrt
    return jnp.maximum(sq[..., m:] - sq[..., : sq.shape[-1] - m], 0.0)


def sliding_cosine(
    ref: jax.Array, target: jax.Array, eps: float = 1e-8
) -> jax.Array:
    """Cosine similarity of ``target`` against every window of ``ref``
    (reference seq_cos_sim, FaSNet.py:423-453): (..., n) × (..., m) →
    (..., n - m + 1)."""
    m = target.shape[-1]
    out_len = ref.shape[-1] - m + 1
    num = sliding_corr(ref, target, out_len)
    ref_norm = jnp.sqrt(sliding_sumsq(ref, m)) + eps
    t_norm = jnp.linalg.norm(target, axis=-1, keepdims=True) + eps
    # clip: cosine is bounded by construction, but on all-zero windows
    # (padding contexts) the FFT correlation leaves O(1e-6) noise that the
    # eps-guarded norm then amplifies — torch's exact conv returns 0 there
    return jnp.clip(num / (ref_norm * t_norm), -1.0, 1.0)


def overlap_add(windows: jax.Array, stride: int) -> jax.Array:
    """(..., L, W) overlapping windows at ``stride`` → (..., (L-1)*stride+W)
    via a static scatter-add (reference's paired reshape trick,
    FaSNet.py:594-600, without the L-even restriction)."""
    L, w = windows.shape[-2], windows.shape[-1]
    out_t = (L - 1) * stride + w
    idx = (jnp.arange(L)[:, None] * stride + jnp.arange(w)[None, :]).reshape(-1)
    flat = windows.reshape(windows.shape[:-2] + (L * w,))
    out = jnp.zeros(windows.shape[:-2] + (out_t,), windows.dtype)
    return out.at[..., idx].add(flat)


def _masked_mean(
    x: jax.Array, num_valid: Optional[jax.Array], axis: int
) -> jax.Array:
    """Mean over ``axis``; with ``num_valid`` (B,), only the first
    ``num_valid[b]`` entries count (reference's valid-channel loops)."""
    if num_valid is None:
        return jnp.mean(x, axis=axis)
    n = x.shape[axis]
    shape = [1] * x.ndim
    shape[axis] = n
    mask = jnp.arange(n).reshape(shape) < num_valid.reshape(
        [-1] + [1] * (x.ndim - 1)
    )
    denom = jnp.maximum(jnp.sum(mask, axis=axis), 1)
    return jnp.sum(jnp.where(mask, x, 0.0), axis=axis) / denom


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


class GlobalLayerNorm(nn.Module):
    """torch ``GroupNorm(1, C)`` on (B, C, *spatial): normalize over
    channel+spatial jointly, per-channel affine."""

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, C, ...)
        c = x.shape[1]
        axes = tuple(range(1, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        shape = (1, c) + (1,) * (x.ndim - 2)
        gamma = self.param("scale", nn.initializers.ones, shape)
        beta = self.param("bias", nn.initializers.zeros, shape)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * gamma + beta


class BiLSTM(nn.Module):
    """Bidirectional LSTM + Dense back to ``out`` (reference SingleRNN,
    FaSNet.py:16-48)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, N) → (B, T, out)
        y = nn.Bidirectional(
            nn.RNN(nn.OptimizedLSTMCell(self.hidden)),
            nn.RNN(nn.OptimizedLSTMCell(self.hidden)),
            name="rnn",
        )(x)
        return nn.Dense(self.out, name="proj")(y)


class TACLayer(nn.Module):
    """Transform-average-concatenate across channels
    (reference DPRNN_TAC ch_* stacks, FaSNet.py:151-162,203-216)."""

    hidden: int

    @nn.compact
    def __call__(
        self, x: jax.Array, num_mic: Optional[jax.Array]
    ) -> jax.Array:  # (B, ch, N, K, S)
        b, ch, n, k, s = x.shape
        h3 = self.hidden * 3
        feats = jnp.transpose(x, (0, 3, 4, 1, 2))  # B, K, S, ch, N
        tr = nn.PReLU()(nn.Dense(h3, name="transform")(feats))
        mean = _masked_mean(tr, num_mic, axis=3)  # B, K, S, H3
        mean = nn.PReLU()(nn.Dense(h3, name="average")(mean))
        mean = jnp.broadcast_to(mean[:, :, :, None, :], tr.shape)
        cat = jnp.concatenate([tr, mean], axis=-1)
        out = nn.PReLU()(nn.Dense(n, name="concat")(cat))
        out = jnp.transpose(out, (0, 3, 4, 1, 2))  # B, ch, N, K, S
        out = GlobalLayerNorm(name="norm")(out.reshape(b * ch, n, k, s))
        return x + out.reshape(b, ch, n, k, s)


class DualPathTAC(nn.Module):
    """Stack of (intra-chunk BiLSTM, inter-chunk BiLSTM, TAC) layers on
    (B, ch, N, K, S) segments (reference DPRNN_TAC.forward,
    FaSNet.py:176-221); ``use_tac=False`` gives the plain DPRNN used by
    the single-channel BF module."""

    hidden: int
    n_layers: int = 4
    out_dim: int = 64
    use_tac: bool = True

    @nn.compact
    def __call__(
        self, x: jax.Array, num_mic: Optional[jax.Array] = None
    ) -> jax.Array:  # (B, ch, N, K, S) → (B, ch, out_dim, K, S)
        b, ch, n, k, s = x.shape
        for i in range(self.n_layers):
            # intra-segment: sequences along K, batched over (b, ch, s)
            row_in = jnp.transpose(
                x.reshape(b * ch, n, k, s), (0, 3, 2, 1)
            ).reshape(b * ch * s, k, n)
            row = BiLSTM(self.hidden, n, name=f"row_{i}")(row_in)
            row = jnp.transpose(
                row.reshape(b * ch, s, k, n), (0, 3, 2, 1)
            )  # B*ch, N, K, S
            x = x + GlobalLayerNorm(name=f"row_norm_{i}")(row).reshape(
                b, ch, n, k, s
            )
            # inter-segment: sequences along S, batched over (b, ch, k)
            col_in = jnp.transpose(
                x.reshape(b * ch, n, k, s), (0, 2, 3, 1)
            ).reshape(b * ch * k, s, n)
            col = BiLSTM(self.hidden, n, name=f"col_{i}")(col_in)
            col = jnp.transpose(
                col.reshape(b * ch, k, s, n), (0, 3, 1, 2)
            )
            x = x + GlobalLayerNorm(name=f"col_norm_{i}")(col).reshape(
                b, ch, n, k, s
            )
            if self.use_tac:
                x = TACLayer(self.hidden, name=f"tac_{i}")(x, num_mic)
        out = nn.PReLU()(x)
        out = jnp.transpose(out, (0, 1, 3, 4, 2))  # B, ch, K, S, N
        out = nn.Dense(self.out_dim, name="output")(out)
        return jnp.transpose(out, (0, 1, 4, 2, 3))


def split_segments(x: jax.Array, k: int) -> jax.Array:
    """(..., N, T) → 50 %-overlap segments (..., N, K, S); pads with
    leading/trailing K/2 like the reference (pad_segment, FaSNet.py:251-264)
    so overlap-add inverts exactly after trimming."""
    t = x.shape[-1]
    stride = k // 2
    rest = (k - (stride + t % k) % k) % k
    y = jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(stride, rest + stride)]
    )
    s = (y.shape[-1] - k) // stride + 1
    idx = jnp.arange(s)[:, None] * stride + jnp.arange(k)[None, :]
    segs = y[..., idx]  # (..., N, S, K)
    return jnp.swapaxes(segs, -1, -2)  # (..., N, K, S)


def merge_segments(segs: jax.Array, t: int) -> jax.Array:
    """Inverse of :func:`split_segments`: (..., N, K, S) → (..., N, T)."""
    k = segs.shape[-2]
    stride = k // 2
    win = jnp.swapaxes(segs, -1, -2)  # (..., N, S, K)
    full = overlap_add(win, stride)
    return full[..., stride : stride + t]


class BFModule(nn.Module):
    """Bottleneck → dual-path (TAC) → gated filter head
    (reference BF_module, FaSNet.py:301-345)."""

    feature_dim: int = 64
    hidden_dim: int = 128
    filter_dim: int = 513
    n_layers: int = 4
    segment_size: int = 50
    nspk: int = 1
    use_tac: bool = True

    @nn.compact
    def __call__(
        self, feats: jax.Array, num_mic: Optional[jax.Array] = None
    ) -> jax.Array:  # (B, ch, D, L) → (B, ch, nspk, L, filter_dim)
        b, ch, d, L = feats.shape
        x = jnp.swapaxes(feats, -1, -2)  # B, ch, L, D
        x = nn.Dense(self.feature_dim, use_bias=False, name="bottleneck")(x)
        x = jnp.swapaxes(x, -1, -2)  # B, ch, N, L
        segs = split_segments(x, self.segment_size)  # B, ch, N, K, S
        out = DualPathTAC(
            self.hidden_dim, self.n_layers,
            out_dim=self.feature_dim * self.nspk, use_tac=self.use_tac,
            name="dprnn",
        )(segs, num_mic)  # B, ch, N*nspk, K, S
        k, s = out.shape[-2], out.shape[-1]
        out = out.reshape(b, ch * self.nspk, self.feature_dim, k, s)
        merged = merge_segments(out, L)  # B, ch*nspk, N, L
        y = jnp.swapaxes(merged, -1, -2)  # B, ch*nspk, L, N
        filt = jnp.tanh(nn.Dense(self.filter_dim, name="out")(y)) * jax.nn.sigmoid(
            nn.Dense(self.filter_dim, name="gate")(y)
        )
        return filt.reshape(b, ch, self.nspk, L, self.filter_dim)


# ---------------------------------------------------------------------------
# FaSNet-TAC
# ---------------------------------------------------------------------------


class FaSNetOrigin(nn.Module):
    """Original two-stage FaSNet (reference FaSNet_origin, FaSNet.py:466-556):
    stage 1 filters the reference mic into a clean cue (DPRNN over
    enc⊕cosine features, ``nspk`` filters); stage 2 beamforms every other
    mic against that cue (second DPRNN, one filter per mic) and the
    overlap-added outputs are averaged over valid mics.

    (B, nmic, T) (+ optional ``num_mic`` (B,)) → (B, nspk, T)."""

    enc_dim: int = 64
    feature_dim: int = 64
    hidden_dim: int = 128
    n_layers: int = 6
    segment_size: int = 50
    nspk: int = 1
    win_len_ms: float = 4.0
    context_len_ms: float = 16.0
    sr: int = 16000

    @nn.compact
    def __call__(
        self, wav: jax.Array, num_mic: Optional[jax.Array] = None
    ) -> jax.Array:
        b, nmic, t = wav.shape
        w = int(self.sr * self.win_len_ms / 1000)
        c = int(self.sr * self.context_len_ms / 1000)
        stride = w // 2
        filter_dim = 2 * c + 1

        rest = (w - (stride + t % w) % w) % w
        x = jnp.pad(wav, [(0, 0), (0, 0), (stride, rest + stride)])
        nsample = x.shape[-1]
        x = jnp.pad(x, [(0, 0), (0, 0), (c, c)])
        L = 2 * nsample // w - 1
        idx = jnp.arange(L)[:, None] * stride + jnp.arange(2 * c + w)[None, :]
        chunks = x[..., idx]  # B, nmic, L, 2c+w
        center = chunks[..., c : c + w]

        # shared waveform encoder + gLN (reference self.encoder/enc_LN used
        # by both stages, FaSNet.py:367-369,504,528)
        encoder = nn.Dense(self.enc_dim, use_bias=False, name="encoder")
        enc_norm = GlobalLayerNorm(name="enc_norm")

        def encode(ctx):  # (B*, L, 2c+w) → (B*, N, L), normalized
            e = jnp.swapaxes(encoder(ctx), -1, -2)
            return enc_norm(e.reshape(-1, self.enc_dim, ctx.shape[-2])
                            ).reshape(e.shape)

        # ---- stage 1: clean up the reference mic
        # cosine of OTHER mics' center frames slid over the ref context,
        # averaged over valid others (FaSNet.py:485-498)
        ref_cos = sliding_cosine(
            chunks[:, :1], center[:, 1:]
        )  # B, nmic-1, L, 2c+1
        n_other = None if num_mic is None else jnp.maximum(num_mic - 1, 1)
        ref_cos = _masked_mean(ref_cos, n_other, axis=1)  # B, L, 2c+1
        ref_enc = encode(chunks[:, 0])  # B, N, L
        ref_feat = jnp.concatenate(
            [ref_enc, jnp.swapaxes(ref_cos, -1, -2)], axis=1
        )[:, None]  # B, 1, N+2c+1, L
        ref_filter = BFModule(
            self.feature_dim, self.hidden_dim, filter_dim,
            self.n_layers, self.segment_size, self.nspk, use_tac=False,
            name="ref_bf",
        )(ref_feat)[:, 0]  # B, nspk, L, 2c+1
        ref_out = sliding_corr(
            chunks[:, :1], ref_filter, w
        )  # B, nspk, L, w  (ref context ⋆ per-spk filter)

        # ---- stage 2: beamform the other mics against the cue
        other_ctx = chunks[:, None, 1:]  # B, 1, nmic-1, L, 3w'
        other_cos = sliding_cosine(
            other_ctx, ref_out[:, :, None]
        )  # B, nspk, nmic-1, L, 2c+1
        other_enc = encode(
            chunks[:, 1:].reshape(b * (nmic - 1), L, 2 * c + w)
        ).reshape(b, nmic - 1, self.enc_dim, L)
        other_enc = jnp.broadcast_to(
            other_enc[:, None], (b, self.nspk) + other_enc.shape[1:]
        )
        other_feat = jnp.concatenate(
            [other_enc, jnp.swapaxes(other_cos, -1, -2)], axis=3
        )  # B, nspk, nmic-1, N+2c+1, L
        other_filter = BFModule(
            self.feature_dim, self.hidden_dim, filter_dim,
            self.n_layers, self.segment_size, 1, use_tac=False,
            name="other_bf",
        )(other_feat.reshape(
            b * self.nspk, nmic - 1, self.enc_dim + filter_dim, L
        ))[:, :, 0]  # B*nspk, nmic-1, L, 2c+1
        other_out = sliding_corr(
            jnp.broadcast_to(
                other_ctx, (b, self.nspk, nmic - 1, L, 2 * c + w)
            ).reshape(b * self.nspk, nmic - 1, L, 2 * c + w),
            other_filter, w,
        ).reshape(b, self.nspk, nmic - 1, L, w)

        all_out = jnp.concatenate(
            [ref_out[:, :, None], other_out], axis=2
        )  # B, nspk, nmic, L, w
        sig = overlap_add(all_out, stride)[..., stride : stride + t]
        return _masked_mean(sig, num_mic, axis=2)  # B, nspk, T


class FaSNetTAC(nn.Module):
    """Single-stage FaSNet + TAC (reference FaSNet_TAC, FaSNet.py:558-616).

    ``__call__``: (B, nmic, T) waveforms (+ optional ``num_mic`` (B,) valid
    channel counts; None = fixed geometry) → (B, nspk, T) beamformed
    estimates."""

    enc_dim: int = 64
    feature_dim: int = 64
    hidden_dim: int = 128
    n_layers: int = 4
    segment_size: int = 50
    nspk: int = 1
    win_len_ms: float = 4.0
    context_len_ms: float = 16.0
    sr: int = 16000

    @property
    def window(self) -> int:
        return int(self.sr * self.win_len_ms / 1000)

    @property
    def context(self) -> int:
        return int(self.sr * self.context_len_ms / 1000)

    @nn.compact
    def __call__(
        self, wav: jax.Array, num_mic: Optional[jax.Array] = None
    ) -> jax.Array:
        b, nmic, t = wav.shape
        w, c = self.window, self.context
        stride = w // 2
        filter_dim = 2 * c + 1

        # --- segment with context (seg_signal_context, FaSNet.py:389-421)
        rest = (w - (stride + t % w) % w) % w
        x = jnp.pad(wav, [(0, 0), (0, 0), (stride, rest + stride)])
        nsample = x.shape[-1]
        x = jnp.pad(x, [(0, 0), (0, 0), (c, c)])
        L = 2 * nsample // w - 1
        idx = jnp.arange(L)[:, None] * stride + jnp.arange(2 * c + w)[None, :]
        chunks = x[..., idx]  # B, nmic, L, 2c+w
        center = chunks[..., c : c + w]  # B, nmic, L, w

        # --- encoder: full-window conv == Dense on the context chunk
        enc = nn.Dense(self.enc_dim, use_bias=False, name="encoder")(chunks)
        enc = jnp.swapaxes(enc, -1, -2)  # B, nmic, N, L
        enc = GlobalLayerNorm(name="enc_norm")(
            enc.reshape(b * nmic, self.enc_dim, L)
        ).reshape(b, nmic, self.enc_dim, L)

        # --- cosine features: every channel's context vs ref center frame
        ref_seg = center[:, :1]  # B, 1, L, w
        cos = sliding_cosine(chunks, ref_seg)  # B, nmic, L, 2c+1
        cos = jnp.swapaxes(cos, -1, -2)  # B, nmic, 2c+1, L

        feats = jnp.concatenate([enc, cos], axis=2)  # B, nmic, N+2c+1, L
        filt = BFModule(
            self.feature_dim, self.hidden_dim, filter_dim,
            self.n_layers, self.segment_size, self.nspk, use_tac=True,
            name="bf",
        )(feats, num_mic)  # B, nmic, nspk, L, 2c+1

        # --- filter-and-sum: correlate each chunk with its filter
        bf_win = sliding_corr(
            chunks[:, :, None], filt, w
        )  # B, nmic, nspk, L, w
        sig = overlap_add(bf_win, stride)  # B, nmic, nspk, nsample+stride*?
        sig = sig[..., stride : stride + t]  # trim lead pad + rest
        return _masked_mean(sig, num_mic, axis=1)  # B, nspk, T

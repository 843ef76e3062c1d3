"""Speech enhancement models (reference: se/ — DPRNN/FaSNet zoo,
se/models/FaSNet.py; the SE model actually used at LID test time was
closed-source and reached over HTTP, lid/README.md:9).

Here a trainable TPU-native replacement: a compact DPRNN-TasNet masker —
learned conv encoder → chunked dual-path (intra ‖ inter) BiLSTM with
LayerNorm → sigmoid mask → transposed-conv overlap-add decoder — suitable
as the ``enhance_fn`` plugged into the eval harness.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class DualPathBlock(nn.Module):
    """Intra-chunk then inter-chunk BiLSTM, each with residual + LayerNorm
    (the DPRNN core)."""

    hidden: int = 64

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, S, K, N)
        b, s, k, n = x.shape
        # intra: over chunk dim K for every segment
        intra_in = x.reshape(b * s, k, n)
        intra = nn.Bidirectional(
            nn.RNN(nn.OptimizedLSTMCell(self.hidden)),
            nn.RNN(nn.OptimizedLSTMCell(self.hidden)),
            name="intra_rnn",
        )(intra_in)
        intra = nn.Dense(n, name="intra_proj")(intra)
        x = x + nn.LayerNorm(name="intra_ln")(intra.reshape(b, s, k, n))
        # inter: over segment dim S for every chunk position
        inter_in = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * k, s, n)
        inter = nn.Bidirectional(
            nn.RNN(nn.OptimizedLSTMCell(self.hidden)),
            nn.RNN(nn.OptimizedLSTMCell(self.hidden)),
            name="inter_rnn",
        )(inter_in)
        inter = nn.Dense(n, name="inter_proj")(inter)
        inter = nn.LayerNorm(name="inter_ln")(inter.reshape(b, k, s, n))
        return x + jnp.transpose(inter, (0, 2, 1, 3))


class DPRNNEnhancer(nn.Module):
    """Waveform-to-waveform mask-based enhancement."""

    enc_dim: int = 64
    win: int = 16  # encoder kernel/stride (50 % overlap)
    chunk: int = 100
    n_blocks: int = 2
    hidden: int = 64

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:  # (B, T) → (B, T)
        b, t = wav.shape
        stride = self.win // 2
        # pad so both framing and chunking are exact
        n_frames = -(-(t - self.win) // stride) + 1
        pad_t = (n_frames - 1) * stride + self.win - t
        x = jnp.pad(wav, [(0, 0), (0, pad_t)])[:, :, None]
        feats = nn.Conv(
            self.enc_dim, (self.win,), strides=(stride,), padding="VALID",
            name="encoder",
        )(x)  # (B, F, N)
        feats = jax.nn.relu(feats)
        f = feats.shape[1]
        s = -(-f // self.chunk)
        pad_f = s * self.chunk - f
        y = jnp.pad(feats, [(0, 0), (0, pad_f), (0, 0)])
        y = y.reshape(b, s, self.chunk, self.enc_dim)
        for i in range(self.n_blocks):
            y = DualPathBlock(self.hidden, name=f"dp_{i}")(y)
        mask = jax.nn.sigmoid(
            nn.Dense(self.enc_dim, name="mask_proj")(y)
        ).reshape(b, s * self.chunk, self.enc_dim)[:, :f, :]
        enhanced = feats * mask
        out = nn.ConvTranspose(
            1, (self.win,), strides=(stride,), padding="VALID", name="decoder"
        )(enhanced)[:, :, 0]
        return out[:, :t]


def si_snr(est: jax.Array, ref: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Scale-invariant SNR (dB) per utterance, (B, T) → (B,)."""
    ref_zm = ref - jnp.mean(ref, axis=-1, keepdims=True)
    est_zm = est - jnp.mean(est, axis=-1, keepdims=True)
    proj = (
        jnp.sum(est_zm * ref_zm, axis=-1, keepdims=True)
        * ref_zm
        / (jnp.sum(ref_zm**2, axis=-1, keepdims=True) + eps)
    )
    noise = est_zm - proj
    return 10.0 * jnp.log10(
        (jnp.sum(proj**2, axis=-1) + eps) / (jnp.sum(noise**2, axis=-1) + eps)
    )

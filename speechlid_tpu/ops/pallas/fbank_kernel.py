"""Fused Pallas TPU kernel: framed audio → dB mel spectrogram.

The BASELINE.json north star: replace the reference's CPU torchaudio
frontend with a fused on-device kernel.  Frame extraction (strided im2col)
stays in XLA — a 160-sample hop is not expressible as a lane-aligned Mosaic
vector load — and everything downstream fuses into ONE VMEM-resident
Pallas kernel per 128-frame block:

  1. frames @ [windowed cos | windowed sin] basis  (n_fft × 2·bins, MXU)
  2. power = re² + im² (VPU, no (B, F, bins) HBM roundtrip)
  3. mel = power @ [fb; fb]  (2·bins × n_mels, MXU)
  4. 10·log10 → out block

Measured on v5e the XLA fft/conv formulations are already HBM-bandwidth
bound for this op (µs per batch); the kernel exists to (a) pin the fused
shape as a building block for bigger fusions (frontend + SpecAugment +
subsampling) and (b) exercise the Pallas path with exact parity tests.

The dB conversion's per-utterance top_db clamp needs a global max, so the
kernel emits 10·log10(mel) and the caller applies the (cheap) clamp.

Use :func:`pallas_wav2mel` as a drop-in for frontend.wav2mel's mel body; it
falls back to interpret mode off-TPU so CPU tests still validate numerics.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speechlid_tpu.ops import frontend as F

FRAMES_PER_BLOCK = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=None)
def _bases(n_fft: int, win_length: int, n_mels: int, sample_rate: int):
    """(n_fft, 2·bins_pad) windowed DFT basis and (2·bins_pad, n_mels) mel
    projector, padded so every matmul dim is lane-aligned (×128).

    The power spectrum re²+im² is folded into ONE matmul by stacking the
    mel filterbank twice: [re|im] elementwise-squared then @ [fb; fb].
    """
    bins = n_fft // 2 + 1
    bins_pad = _round_up(bins, 128)
    cos_b, sin_b = F._dft_basis(n_fft)  # (bins, n_fft) each
    window = np.zeros(n_fft, dtype=np.float32)
    pad_left = (n_fft - win_length) // 2
    window[pad_left : pad_left + win_length] = F._hann_window(win_length)
    basis = np.zeros((n_fft, 2 * bins_pad), np.float32)
    basis[:, :bins] = (cos_b * window[None, :]).T
    basis[:, bins_pad : bins_pad + bins] = (sin_b * window[None, :]).T
    fb = F.mel_filterbank(bins, n_mels, sample_rate)  # (bins, n_mels)
    mel_proj = np.zeros((2 * bins_pad, _round_up(n_mels, 128)), np.float32)
    mel_proj[:bins, :n_mels] = fb
    mel_proj[bins_pad : bins_pad + bins, :n_mels] = fb
    # numpy, NOT jnp: lru_cache must never capture traced/device values
    return basis, mel_proj


def _fbank_kernel(
    frames_ref,  # (FRAMES_PER_BLOCK, n_fft) VMEM frame block
    basis_ref,  # (n_fft, 2·bins_pad)
    mel_ref,  # (2·bins_pad, n_mels_pad)
    out_ref,  # (FRAMES_PER_BLOCK, n_mels_pad)
):
    proj = jnp.dot(
        frames_ref[:, :], basis_ref[:, :],
        preferred_element_type=jnp.float32,
    )  # (128, 2·bins_pad) — padded lanes are exact zeros
    power = proj * proj
    mel = jnp.dot(power, mel_ref[:, :], preferred_element_type=jnp.float32)
    out_ref[:, :] = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))


def pallas_log_mel(
    wav: jax.Array,
    sample_rate: int = 16000,
    n_fft: int = 512,
    win_length: int = 400,
    hop_length: int = 160,
    n_mels: int = 80,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """(B, T) → (B, n_mels, frames) power-dB mel (no top_db clamp yet).

    Matches 10·log10 of frontend.mel_spectrogram (center=True reflect).
    """
    b, t = wav.shape
    n_frames = 1 + t // hop_length
    blocks = -(-n_frames // FRAMES_PER_BLOCK)
    frames_padded = blocks * FRAMES_PER_BLOCK
    x = F._reflect_pad(wav, n_fft // 2)
    need = (frames_padded - 1) * hop_length + n_fft
    x = jnp.pad(x, [(0, 0), (0, max(0, need - x.shape[1]))])
    # frame extraction stays in XLA (strided im2col — lane-unaligned hops
    # are not expressible as Mosaic vector loads); everything downstream
    # (window ∘ DFT ∘ |·|² ∘ mel ∘ log) fuses in ONE VMEM-resident kernel,
    # two MXU matmuls per 128-frame block.
    frames = F._frame(x, n_fft, hop_length)  # (B, frames_padded, n_fft)
    frames = frames.reshape(b * frames_padded, n_fft)

    basis_np, mel_proj_np = _bases(n_fft, win_length, n_mels, sample_rate)
    basis, mel_proj = jnp.asarray(basis_np), jnp.asarray(mel_proj_np)
    n_mels_pad = mel_proj.shape[1]

    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu",)

    total_blocks = b * frames_padded // FRAMES_PER_BLOCK
    out = pl.pallas_call(
        _fbank_kernel,
        grid=(total_blocks,),
        in_specs=[
            pl.BlockSpec(
                (FRAMES_PER_BLOCK, n_fft), lambda k: (k, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(basis.shape, lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mel_proj.shape, lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (FRAMES_PER_BLOCK, n_mels_pad), lambda k: (k, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b * frames_padded, n_mels_pad), jnp.float32
        ),
        interpret=interpret,
    )(frames, basis, mel_proj)
    out = out.reshape(b, frames_padded, n_mels_pad)[:, :n_frames, :n_mels]
    return jnp.transpose(out, (0, 2, 1))  # (B, n_mels, F)


def pallas_wav2mel(
    wav: jax.Array,
    sample_rate: int = 16000,
    n_mels: int = 80,
    lengths: Optional[jax.Array] = None,
    top_db: float = 80.0,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Drop-in for frontend.wav2mel (non-kaldi path) using the fused kernel:
    dB mel with per-utterance top_db clamp."""
    mel_db = pallas_log_mel(
        wav, sample_rate=sample_rate, n_mels=n_mels, interpret=interpret
    )
    f_len = (
        None if lengths is None
        else F.frame_lengths(lengths, int(sample_rate * 0.01))
    )
    if f_len is not None:
        valid = jnp.arange(mel_db.shape[-1])[None, None, :] < f_len[:, None, None]
        peak = jnp.max(jnp.where(valid, mel_db, -jnp.inf), axis=(1, 2),
                       keepdims=True)
    else:
        peak = jnp.max(mel_db, axis=(1, 2), keepdims=True)
    return jnp.maximum(mel_db, peak - top_db)

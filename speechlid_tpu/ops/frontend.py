"""Batched on-device audio frontend: wav → log-mel fbank.

TPU-first rebuild of the reference frontend (lid/audio_processor.py:72-105
``_internal_wav2mel`` = torchaudio MelSpectrogram + AmplitudeToDB(top_db=80),
and :41 ``_kaidi_wav2mel`` = torchaudio.compliance.kaldi.fbank).  Numerical
parity with both is enforced by tests/test_frontend.py golden comparisons.

Design notes (why this is not a port):

- The whole frontend is *batched and jitted*.  The reference computes mels
  per utterance on CPU in DataLoader workers; here a (B, T) padded wav batch
  becomes (B, n_mels, F) in one compiled graph on device.
- The STFT is expressed as a **strided convolution against a windowed DFT
  basis** (``method="dft_conv"``), i.e. one big matmul on the MXU, fused by
  XLA with the mel projection (another matmul) and the log.  An
  ``method="fft"`` path (jnp.fft.rfft) is kept for verification; the conv
  path is the performance path because TPU has no native FFT unit — the MXU
  *is* the fast way to do a 512-point DFT at these sizes.
- Variable length is carried as explicit integer sample lengths; use
  :func:`frame_lengths` to convert to frame counts and mask downstream.
  (The reference instead carries float "percent" lengths,
  lid/raw_datasets.py:356-362.)
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Waveform-domain pieces
# ---------------------------------------------------------------------------


def normalize_wav(wav: jax.Array, lengths: Optional[jax.Array] = None) -> jax.Array:
    """Per-utterance mean/std normalization (reference ``normalize_wav``,
    lid/audio_processor.py:108-114: (x - mean) / (std + 1e-6)).

    ``wav``: (..., T).  When ``lengths`` is given, statistics are computed
    over the valid prefix only (the reference operates on unpadded CPU
    tensors; masking reproduces that under static shapes).
    """
    if lengths is None:
        mean = jnp.mean(wav, axis=-1, keepdims=True)
        # torch.std_mean uses the unbiased (n-1) estimator.
        n = wav.shape[-1]
        var = jnp.sum((wav - mean) ** 2, axis=-1, keepdims=True) / max(n - 1, 1)
    else:
        t = jnp.arange(wav.shape[-1])
        mask = (t < lengths[..., None]).astype(wav.dtype)
        n = jnp.maximum(lengths[..., None].astype(wav.dtype), 1.0)
        mean = jnp.sum(wav * mask, axis=-1, keepdims=True) / n
        var = jnp.sum(((wav - mean) * mask) ** 2, axis=-1, keepdims=True) / jnp.maximum(
            n - 1.0, 1.0
        )
    std = jnp.sqrt(var)
    out = (wav - mean) / (std + 1e-6)
    if lengths is not None:
        t = jnp.arange(wav.shape[-1])
        out = jnp.where(t < lengths[..., None], out, 0.0)
    return out


def preemphasis(wav: jax.Array, coeff: float = 0.97) -> jax.Array:
    """y[0]=x[0]; y[t]=x[t]-coeff*x[t-1]  (reference wav_augment,
    lid/audio_processor.py:127-131)."""
    return jnp.concatenate(
        [wav[..., :1], wav[..., 1:] - coeff * wav[..., :-1]], axis=-1
    )


# ---------------------------------------------------------------------------
# Windows / DFT / mel bases (host-side numpy, baked as constants into jit)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _hann_window(win_length: int) -> np.ndarray:
    # torch.hann_window(periodic=True)
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _povey_window(win_length: int) -> np.ndarray:
    # kaldi's default window: hann^0.85 with denominator N-1 (symmetric)
    n = np.arange(win_length)
    return (
        (0.5 - 0.5 * np.cos(2.0 * np.pi * n / (win_length - 1))) ** 0.85
    ).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dft_basis(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag rows of the onesided DFT: each (n_fft//2+1, n_fft) f32."""
    k = np.arange(n_fft // 2 + 1)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = -2.0 * np.pi * k * n / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
) -> np.ndarray:
    """HTK-scale triangular mel filterbank, (n_freqs, n_mels), matching
    torchaudio.functional.melscale_fbanks(norm=None, mel_scale='htk') —
    the basis used by the MelSpectrogram in lid/audio_processor.py:91-103.
    """
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _kaldi_mel_banks(
    n_mels: int,
    padded_window_size: int,
    sample_rate: int,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi-style mel banks, (n_mels, n_fft//2) — note kaldi drops the
    nyquist bin.  Matches torchaudio.compliance.kaldi.get_mel_banks
    (mel scale 1127*ln(1+f/700), triangles in mel domain over fft bins).
    """
    num_fft_bins = padded_window_size // 2
    nyquist = 0.5 * sample_rate
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq

    def hz2mel(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    fft_bin_width = sample_rate / padded_window_size
    mel_low = hz2mel(low_freq)
    mel_high = hz2mel(high_freq)
    mel_delta = (mel_high - mel_low) / (n_mels + 1)

    bins = np.arange(n_mels)[:, None]
    left_mel = mel_low + bins * mel_delta
    center_mel = mel_low + (bins + 1.0) * mel_delta
    right_mel = mel_low + (bins + 2.0) * mel_delta

    mel = hz2mel(fft_bin_width * np.arange(num_fft_bins))[None, :]
    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)
    fb = np.maximum(0.0, np.minimum(up_slope, down_slope))
    return fb.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT → mel (torchaudio MelSpectrogram semantics)
# ---------------------------------------------------------------------------


def _reflect_pad(wav: jax.Array, pad: int) -> jax.Array:
    """torch 'reflect' padding along the last axis."""
    left = wav[..., 1 : pad + 1][..., ::-1]
    right = wav[..., -pad - 1 : -1][..., ::-1]
    return jnp.concatenate([left, wav, right], axis=-1)


def _frame(wav: jax.Array, frame_len: int, hop: int) -> jax.Array:
    """(B, T) → (B, F, frame_len) via XLA's patch-extraction conv."""
    b = wav.shape[0]
    patches = jax.lax.conv_general_dilated_patches(
        wav[:, None, :],  # (B, C=1, T)
        filter_shape=(frame_len,),
        window_strides=(hop,),
        padding="VALID",
    )  # (B, frame_len, F)
    return jnp.transpose(patches, (0, 2, 1))


def _stft_powspec(
    wav: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: np.ndarray,
    center: bool = True,
    method: str = "dft_conv",
) -> jax.Array:
    """(B, T) → power spectrogram (B, F, n_fft//2+1), torch.stft semantics:
    window zero-padded symmetrically to n_fft, centered reflect padding.
    """
    if center:
        wav = _reflect_pad(wav, n_fft // 2)
    # window padded to n_fft, centered (torch.stft behavior)
    pad_left = (n_fft - win_length) // 2
    w = np.zeros(n_fft, dtype=np.float32)
    w[pad_left : pad_left + win_length] = window
    if method == "fft":
        frames = _frame(wav, n_fft, hop_length) * w  # (B, F, n_fft)
        spec = jnp.fft.rfft(frames, axis=-1)
        return jnp.abs(spec) ** 2
    # dft_conv: one strided conv whose kernels are the windowed DFT basis —
    # a (2*(n_fft//2+1), n_fft) matmul per frame on the MXU.
    cos_b, sin_b = _dft_basis(n_fft)
    basis = jnp.asarray(np.concatenate([cos_b, sin_b], axis=0) * w[None, :])
    out = jax.lax.conv_general_dilated(
        wav[:, None, :].astype(jnp.float32),
        basis[:, None, :],  # (O, I, K)
        window_strides=(hop_length,),
        padding="VALID",
        dimension_numbers=("NCT", "OIT", "NCT"),
    )  # (B, 2*bins, F)
    n_bins = n_fft // 2 + 1
    re, im = out[:, :n_bins, :], out[:, n_bins:, :]
    return jnp.transpose(re * re + im * im, (0, 2, 1))


def mel_spectrogram(
    wav: jax.Array,
    sample_rate: int = 16000,
    n_fft: int = 512,
    win_length: int = 400,
    hop_length: int = 160,
    n_mels: int = 80,
    method: str = "dft_conv",
) -> jax.Array:
    """(B, T) → (B, n_mels, F) power mel spectrogram, matching
    torchaudio.transforms.MelSpectrogram(center=True, pad_mode='reflect',
    power=2.0, onesided=True, norm=None, mel_scale='htk') as configured at
    lid/audio_processor.py:91-103.
    """
    pow_spec = _stft_powspec(
        wav, n_fft, hop_length, win_length, _hann_window(win_length), method=method
    )  # (B, F, bins)
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate))
    mel = pow_spec @ fb  # (B, F, n_mels) — MXU matmul
    return jnp.transpose(mel, (0, 2, 1))


def amplitude_to_db(
    x: jax.Array,
    top_db: Optional[float] = 80.0,
    amin: float = 1e-10,
    ref_value: float = 1.0,
    lengths: Optional[jax.Array] = None,
) -> jax.Array:
    """Power → dB, matching torchaudio.transforms.AmplitudeToDB(stype='power',
    top_db=80) (lid/audio_processor.py:104).  The top_db clamp is relative to
    the per-utterance max; with padding, ``lengths`` (frames) restricts the
    max to valid frames.
    """
    x_db = 10.0 * jnp.log10(jnp.maximum(x, amin))
    x_db = x_db - 10.0 * math.log10(max(amin, ref_value))
    if top_db is not None:
        if lengths is not None:
            t = jnp.arange(x.shape[-1])
            valid = t[None, None, :] < lengths[:, None, None]
            masked = jnp.where(valid, x_db, -jnp.inf)
            peak = jnp.max(masked, axis=(-2, -1), keepdims=True)
        else:
            peak = jnp.max(x_db, axis=(-2, -1), keepdims=True)
        x_db = jnp.maximum(x_db, peak - top_db)
    return x_db


def resolve_method(method: str = "auto") -> str:
    """'auto' → the fused Pallas kernel on real TPUs, the XLA dft_conv
    formulation elsewhere.  ``SPEECHLID_FRONTEND=dft_conv|fft|pallas``
    overrides (kill-switch for the Pallas path)."""
    import os

    forced = os.environ.get("SPEECHLID_FRONTEND")
    if forced:
        return forced
    if method != "auto":
        return method
    return "pallas" if jax.default_backend() == "tpu" else "dft_conv"


def wav2mel(
    wav: jax.Array,
    sample_rate: int = 16000,
    use_kaldi: bool = False,
    win_length: float = 0.025,
    hop_length: float = 0.01,
    n_mels: int = 80,
    n_fft: int = 512,
    lengths: Optional[jax.Array] = None,
    method: str = "auto",
) -> jax.Array:
    """Reference ``wav2mel`` entry (lid/audio_processor.py:8-37): dB mel
    spectrogram or kaldi fbank, (B, T) → (B, n_mels, F).

    The production TPU path (method='auto') runs the fused Pallas kernel
    (ops/pallas/fbank_kernel.py: window∘DFT∘|·|²∘mel∘log in one
    VMEM-resident kernel); CPU and explicit overrides use the XLA
    dft_conv/fft formulations.  All paths are parity-tested against
    torchaudio goldens (tests/test_frontend.py, tests/test_pallas_fbank.py).
    """
    method = resolve_method(method)
    if use_kaldi:
        feats = kaldi_fbank(
            wav,
            sample_rate=sample_rate,
            frame_length_ms=win_length * 1000.0,
            frame_shift_ms=hop_length * 1000.0,
            n_mels=n_mels,
            method="dft_conv" if method == "pallas" else method,
        )
        return jnp.transpose(feats, (0, 2, 1))
    win = int(sample_rate * win_length)
    hop = int(sample_rate * hop_length)
    f_len = None if lengths is None else frame_lengths(lengths, hop, center=True)
    if method == "pallas":
        # lazy import: fbank_kernel imports this module for the shared bases
        from speechlid_tpu.ops.pallas.fbank_kernel import pallas_log_mel

        def _pallas_branch(wav):
            mel_db = pallas_log_mel(
                wav, sample_rate=sample_rate, n_fft=n_fft, win_length=win,
                hop_length=hop, n_mels=n_mels,
            )
            # same top_db clamp as amplitude_to_db (kernel emits raw dB)
            if f_len is not None:
                t = jnp.arange(mel_db.shape[-1])
                valid = t[None, None, :] < f_len[:, None, None]
                peak = jnp.max(jnp.where(valid, mel_db, -jnp.inf),
                               axis=(-2, -1), keepdims=True)
            else:
                peak = jnp.max(mel_db, axis=(-2, -1), keepdims=True)
            return jnp.maximum(mel_db, peak - 80.0)

        def _xla_branch(wav):
            mel = mel_spectrogram(
                wav, sample_rate, n_fft=n_fft, win_length=win,
                hop_length=hop, n_mels=n_mels, method="dft_conv",
            )
            return amplitude_to_db(mel, top_db=80.0, lengths=f_len)

        # branch on the LOWERING platform, not the process default: the
        # same trace may be lowered for CPU (e.g. CPU-backend param init,
        # multi-backend jit) where the Mosaic kernel can't compile
        return jax.lax.platform_dependent(
            wav, tpu=_pallas_branch, default=_xla_branch
        )
    mel = mel_spectrogram(
        wav, sample_rate, n_fft=n_fft, win_length=win, hop_length=hop,
        n_mels=n_mels, method=method,
    )
    return amplitude_to_db(mel, top_db=80.0, lengths=f_len)


def fused_frontend(
    wav: jax.Array,
    lengths: Optional[jax.Array] = None,
    *,
    key: Optional[jax.Array] = None,  # None → eval (no augmentation)
    sample_rate: int = 16000,
    n_mels: int = 80,
    win_length: float = 0.025,
    hop_length: float = 0.01,
    use_kaldi: bool = False,
    normalize: bool = True,
    t_stretch: bool = False,
    stretch_rates: Tuple[float, ...] = (0.9, 1.0, 1.1),
    mask_times: int = 0,
    t_mask_ratio: float = 0.05,
    f_mask: int = 27,
    method: str = "auto",
):
    """The full production frontend in one jittable call:
    normalize → mel (Pallas on TPU) → [TimeStretch] → [SpecAugment] →
    transpose.  Returns ((B, F, n_mels) features, frame lengths).

    Mirrors the reference per-utterance CPU pipeline
    (lid/audio_processor.py wav2mel + spectrogram_augment) as one batched
    device graph; augmentations apply only when ``key`` is given.
    """
    from speechlid_tpu.ops.specaugment import random_time_stretch, spec_augment

    if normalize:
        wav = normalize_wav(wav, lengths)
    mel = wav2mel(
        wav, sample_rate=sample_rate, use_kaldi=use_kaldi,
        win_length=win_length, hop_length=hop_length, n_mels=n_mels,
        lengths=lengths, method=method,
    )  # (B, n_mels, F)
    hop = int(sample_rate * hop_length)
    f_len = (
        None if lengths is None
        else frame_lengths(lengths, hop, center=not use_kaldi,
                           win_length=int(sample_rate * win_length))
    )
    if key is not None and t_stretch:
        k_stretch, key = jax.random.split(key)
        mel, new_len = random_time_stretch(
            k_stretch, mel, hop, rates=stretch_rates, lengths=f_len
        )
        f_len = new_len if new_len is not None else f_len
    if key is not None and mask_times > 0:
        mel = spec_augment(
            key, mel,
            time_mask_ratio=t_mask_ratio,
            freq_mask_param=f_mask,
            n_time_masks=mask_times,
            n_freq_masks=mask_times,
            lengths=f_len,
        )
    return jnp.transpose(mel, (0, 2, 1)), f_len


def log_mel_spectrogram(*args, **kwargs) -> jax.Array:
    """Alias of :func:`wav2mel` (non-kaldi path)."""
    return wav2mel(*args, **kwargs)


# ---------------------------------------------------------------------------
# Kaldi-compliance fbank (torchaudio.compliance.kaldi.fbank as called at
# lid/audio_processor.py:53-62: dither=0, preemphasis_coefficient=1.0)
# ---------------------------------------------------------------------------


def kaldi_fbank(
    wav: jax.Array,
    sample_rate: int = 16000,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    n_mels: int = 80,
    preemphasis_coefficient: float = 1.0,
    remove_dc_offset: bool = True,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
    method: str = "dft_conv",
) -> jax.Array:
    """(B, T) → (B, F, n_mels) log-mel, kaldi semantics: snip_edges framing,
    per-frame DC removal, preemphasis with duplicated first sample, povey
    window, window zero-padded *right* to the next pow2, natural-log mel.
    """
    win = int(sample_rate * frame_length_ms / 1000.0)
    hop = int(sample_rate * frame_shift_ms / 1000.0)
    n_fft = 1 << (win - 1).bit_length()  # round up to power of two

    frames = _frame(wav, win, hop)  # (B, F, win) — snip_edges=True
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis_coefficient != 0.0:
        first = frames[..., :1]
        frames = jnp.concatenate(
            [first - preemphasis_coefficient * first,
             frames[..., 1:] - preemphasis_coefficient * frames[..., :-1]],
            axis=-1,
        )
    frames = frames * jnp.asarray(_povey_window(win))
    # zero-pad right to n_fft
    frames = jnp.pad(frames, [(0, 0), (0, 0), (0, n_fft - win)])
    if method == "fft":
        spec = jnp.fft.rfft(frames, axis=-1)
        pow_spec = (jnp.abs(spec) ** 2)[..., : n_fft // 2]  # drop nyquist
    else:
        cos_b, sin_b = _dft_basis(n_fft)
        basis = jnp.asarray(
            np.concatenate([cos_b[: n_fft // 2], sin_b[: n_fft // 2]], axis=0).T
        )  # (n_fft, 2*(n_fft//2))
        proj = frames @ basis
        half = n_fft // 2
        re, im = proj[..., :half], proj[..., half:]
        pow_spec = re * re + im * im
    fb = jnp.asarray(
        _kaldi_mel_banks(n_mels, n_fft, sample_rate, low_freq, high_freq)
    )  # (n_mels, n_fft//2)
    mel = pow_spec @ fb.T
    return jnp.log(jnp.maximum(mel, jnp.finfo(jnp.float32).eps))


# ---------------------------------------------------------------------------
# Length bookkeeping
# ---------------------------------------------------------------------------


def frame_lengths(
    sample_lengths: jax.Array, hop_length: int, center: bool = True,
    win_length: int = 400,
) -> jax.Array:
    """Samples → frames. center=True (torch.stft): 1 + len//hop.
    center=False (kaldi snip_edges): 1 + (len-win)//hop, 0 if len<win."""
    if center:
        return 1 + sample_lengths // hop_length
    return jnp.where(
        sample_lengths < win_length,
        0,
        1 + (sample_lengths - win_length) // hop_length,
    )

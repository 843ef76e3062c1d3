"""Minimal torch-side stand-ins for packages the reference imports.

Purpose: run the ACTUAL reference code (`/root/reference`: ccml.Trainer,
lid.LidModule_ASR_Supervised, lid.conformer, lid.eer, …) on CPU in this
image for training-fidelity A/B experiments and numerical parity tests —
the image ships torch but not torchaudio / torchmetrics / WavAugment.

Scope is exactly what the reference touches at import + the code paths the
experiments exercise:

- ``torchaudio.transforms.MelSpectrogram`` / ``AmplitudeToDB``: REAL
  implementations (torch.stft + HTK mel filterbank), numerically matching
  torchaudio semantics as configured by the reference
  (lid/audio_processor.py:72-105, lid/conformer.py:277-291) — the same
  semantics our JAX frontend (ops/frontend.py) carries golden parity tests
  for; tests/test_refshim.py closes the loop shim == JAX.
- ``torchaudio.load``: PCM WAV reader (stdlib ``wave``), float32 [-1, 1].
- constructors the reference builds but the experiments never call
  (Resample at 16 kHz passthrough, FrequencyMasking, TimeStretch, sox
  effects, WavAugment EffectChain) raise only on USE, never on import.
- ``torchmetrics``: ``Metric`` base with add_state/reset (enough for
  lid/eer.py's EER2/CAvg), char/word error rates, Accuracy.

Never installed over real packages: ``install()`` registers a stub only
when the true import fails.
"""

from __future__ import annotations

import math
import sys
import types
import wave
from typing import List, Optional, Sequence

import numpy as np
import torch


# ---------------------------------------------------------------------------
# mel filterbank (HTK scale, torchaudio melscale_fbanks(norm=None) semantics)
# ---------------------------------------------------------------------------


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def _mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
) -> np.ndarray:
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return np.maximum(0.0, np.minimum(down, up)).astype(np.float32)


# ---------------------------------------------------------------------------
# torchaudio stub
# ---------------------------------------------------------------------------


class _MelSpectrogram(torch.nn.Module):
    """torchaudio.transforms.MelSpectrogram for the reference's config:
    center=True, pad_mode='reflect', power=2.0, onesided=True, norm=None,
    mel_scale='htk' (lid/audio_processor.py:91-103, lid/conformer.py:277)."""

    def __init__(
        self,
        sample_rate: int = 16000,
        n_fft: int = 400,
        win_length: Optional[int] = None,
        hop_length: Optional[int] = None,
        pad: int = 0,
        n_mels: int = 128,
        center: bool = True,
        pad_mode: str = "reflect",
        power: float = 2.0,
        onesided: bool = True,
        f_min: float = 0.0,
        f_max: Optional[float] = None,
        norm=None,
        mel_scale: str = "htk",
    ) -> None:
        super().__init__()
        if norm is not None or mel_scale != "htk":
            raise NotImplementedError("shim supports norm=None, htk only")
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.win_length = win_length or n_fft
        self.hop_length = hop_length or self.win_length // 2
        self.pad = pad
        self.center = center
        self.pad_mode = pad_mode
        self.power = power
        window = torch.hann_window(self.win_length, periodic=True)
        self.register_buffer("window", window)
        fb = _mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, f_min, f_max)
        self.register_buffer("fb", torch.from_numpy(fb))

    def forward(self, waveform: torch.Tensor) -> torch.Tensor:
        shape = waveform.shape
        wav = waveform.reshape(-1, shape[-1]).to(torch.float32)
        if self.pad > 0:
            wav = torch.nn.functional.pad(wav, (self.pad, self.pad))
        spec = torch.stft(
            wav,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            window=self.window,
            center=self.center,
            pad_mode=self.pad_mode,
            normalized=False,
            onesided=True,
            return_complex=True,
        )  # (B, bins, frames)
        pow_spec = spec.abs() ** self.power
        mel = torch.matmul(pow_spec.transpose(-1, -2), self.fb).transpose(-1, -2)
        return mel.reshape(*shape[:-1], mel.shape[-2], mel.shape[-1])


class _AmplitudeToDB(torch.nn.Module):
    """torchaudio.transforms.AmplitudeToDB(stype='power', top_db=…):
    10·log10(max(x, amin)) with the top_db clamp relative to each
    spectrogram's max over its last two dims."""

    def __init__(self, stype: str = "power", top_db: Optional[float] = None):
        super().__init__()
        if stype != "power":
            raise NotImplementedError("shim supports stype='power' only")
        self.top_db = top_db
        self.amin = 1e-10

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x_db = 10.0 * torch.log10(torch.clamp(x, min=self.amin))
        if self.top_db is not None:
            peak = x_db.amax(dim=(-2, -1), keepdim=True)
            x_db = torch.maximum(x_db, peak - self.top_db)
        return x_db


class _UnusedAtRuntime(torch.nn.Module):
    """Constructor-only stand-in: the reference builds these modules but the
    CPU experiments never invoke them (e.g. Resample when sr==16000 returns
    early).  Calling one is a real error, not a silent wrong answer."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        self._shim_name = type(self).__name__

    def forward(self, *args, **kwargs):
        raise NotImplementedError(
            f"{self._shim_name} is a constructor-only shim "
            "(speechlid_tpu.compat.refstubs); this code path needs the real "
            "torchaudio"
        )


class _Resample(_UnusedAtRuntime):
    def __init__(self, orig_freq: int = 16000, new_freq: int = 16000):
        super().__init__()
        self.orig_freq = orig_freq
        self.new_freq = new_freq


class _FrequencyMasking(_UnusedAtRuntime):
    pass


class _TimeMasking(_UnusedAtRuntime):
    pass


class _TimeStretch(_UnusedAtRuntime):
    pass


def _load_wav(path: str, normalize: bool = True):
    """torchaudio.load for PCM16/PCM32/PCM8 WAV → (float32 (C, T), sr)."""
    with wave.open(path, "rb") as f:
        n_ch = f.getnchannels()
        width = f.getsampwidth()
        sr = f.getframerate()
        raw = f.readframes(f.getnframes())
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    data = data.reshape(-1, n_ch).T  # (C, T)
    return torch.from_numpy(data.copy()), sr


def _mask_along_axis(spec, mask_param, mask_value, axis):
    """torchaudio.functional.mask_along_axis — used by the reference FBank
    SpecAugment path (lid/conformer.py:320).  Single mask, shared across
    the batch, length ~U[0, mask_param)."""
    if mask_param <= 0:
        return spec
    value = torch.rand(1).item() * mask_param
    min_value = torch.rand(1).item() * (spec.size(axis) - value)
    start, length = int(min_value), int(value)
    if length == 0:
        return spec
    sl = [slice(None)] * spec.dim()
    sl[axis] = slice(start, start + length)
    spec = spec.clone()
    spec[tuple(sl)] = mask_value
    return spec


def _build_torchaudio() -> types.ModuleType:
    ta = types.ModuleType("torchaudio")
    ta.__shim__ = "speechlid_tpu.compat.refstubs"
    ta.load = _load_wav

    transforms = types.ModuleType("torchaudio.transforms")
    transforms.MelSpectrogram = _MelSpectrogram
    transforms.AmplitudeToDB = _AmplitudeToDB
    transforms.Resample = _Resample
    transforms.FrequencyMasking = _FrequencyMasking
    transforms.TimeMasking = _TimeMasking
    transforms.TimeStretch = _TimeStretch
    ta.transforms = transforms

    functional = types.ModuleType("torchaudio.functional")
    functional.mask_along_axis = _mask_along_axis
    ta.functional = functional

    sox_effects = types.ModuleType("torchaudio.sox_effects")

    def _no_sox(*args, **kwargs):
        raise NotImplementedError(
            "sox effects need the real torchaudio (env-blocked in this image)"
        )

    sox_effects.apply_effects_tensor = _no_sox
    ta.sox_effects = sox_effects

    compliance = types.ModuleType("torchaudio.compliance")
    kaldi = types.ModuleType("torchaudio.compliance.kaldi")

    def _no_kaldi(*args, **kwargs):
        raise NotImplementedError(
            "kaldi fbank needs the real torchaudio (env-blocked)"
        )

    kaldi.fbank = _no_kaldi
    compliance.kaldi = kaldi
    ta.compliance = compliance

    submods = {
        "torchaudio.transforms": transforms,
        "torchaudio.functional": functional,
        "torchaudio.sox_effects": sox_effects,
        "torchaudio.compliance": compliance,
        "torchaudio.compliance.kaldi": kaldi,
    }
    return ta, submods


# ---------------------------------------------------------------------------
# torchmetrics stub
# ---------------------------------------------------------------------------


class _Metric(torch.nn.Module):
    """torchmetrics.Metric base, just enough for lid/eer.py's subclasses:
    add_state(name, default, dist_reduce_fx) + reset() restoring fresh
    copies of the defaults.  __call__ = update then compute (torchmetrics
    'forward' behaves batch-locally; the reference only uses the return
    value of direct calls on stateless metrics, and update/compute pairs on
    stateful ones, so this simplification is observationally equivalent for
    the reference code paths)."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        self._state_defaults = {}

    def add_state(self, name, default, dist_reduce_fx=None, **kwargs):
        import copy

        self._state_defaults[name] = copy.deepcopy(default)
        setattr(self, name, default)

    def reset(self):
        import copy

        for name, default in self._state_defaults.items():
            setattr(self, name, copy.deepcopy(default))

    def forward(self, *args, **kwargs):
        self.update(*args, **kwargs)
        return self.compute()


def _edit_distance(ref: Sequence, hyp: Sequence) -> int:
    m, n = len(ref), len(hyp)
    if m == 0:
        return n
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[n]


class _ErrorRate(torch.nn.Module):
    """CharErrorRate / WER: sum(editdist)/sum(ref_len) over the call's
    batch (corpus-level, matching torchmetrics)."""

    _units = staticmethod(lambda s: list(s))

    def __init__(self, *args, **kwargs):
        super().__init__()

    def forward(self, preds, target) -> torch.Tensor:
        if isinstance(preds, str):
            preds, target = [preds], [target]
        errors, total = 0, 0
        for p, t in zip(preds, target):
            pu, tu = self._units(p), self._units(t)
            errors += _edit_distance(tu, pu)
            total += len(tu)
        return torch.tensor(errors / max(total, 1), dtype=torch.float32)


class _CharErrorRate(_ErrorRate):
    _units = staticmethod(lambda s: list(s))


class _WER(_ErrorRate):
    _units = staticmethod(lambda s: s.split())


class _Accuracy(torch.nn.Module):
    def __init__(self, *args, task: str = "multiclass", num_classes: int = 0,
                 **kwargs):
        super().__init__()

    def forward(self, preds: torch.Tensor, target: torch.Tensor):
        if preds.dim() > target.dim():
            preds = preds.argmax(dim=-1)
        return (preds == target).float().mean()


def _build_torchmetrics():
    tm = types.ModuleType("torchmetrics")
    tm.__shim__ = "speechlid_tpu.compat.refstubs"
    tm.Metric = _Metric
    tm.CharErrorRate = _CharErrorRate
    tm.WER = _WER
    tm.WordErrorRate = _WER
    tm.Accuracy = _Accuracy

    functional = types.ModuleType("torchmetrics.functional")
    classification = types.ModuleType("torchmetrics.functional.classification")
    functional.classification = classification
    tm.functional = functional
    text = types.ModuleType("torchmetrics.text")
    text.CharErrorRate = _CharErrorRate
    text.WordErrorRate = _WER
    tm.text = text

    submods = {
        "torchmetrics.functional": functional,
        "torchmetrics.functional.classification": classification,
        "torchmetrics.text": text,
    }
    return tm, submods


# ---------------------------------------------------------------------------
# WavAugment stub
# ---------------------------------------------------------------------------


class _EffectChain:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "WavAugment (sox) is env-blocked in this image; the device-side "
            "analogs live in speechlid_tpu.ops.augment"
        )


def _build_augment():
    aug = types.ModuleType("augment")
    aug.__shim__ = "speechlid_tpu.compat.refstubs"
    aug.EffectChain = _EffectChain
    return aug, {}


# ---------------------------------------------------------------------------
# install
# ---------------------------------------------------------------------------

_BUILDERS = {
    "torchaudio": _build_torchaudio,
    "torchmetrics": _build_torchmetrics,
    "augment": _build_augment,
}


def install(names: Optional[List[str]] = None) -> List[str]:
    """Register stubs in sys.modules for each missing package.

    Returns the list of stubbed names.  A package that truly imports is
    never shadowed.
    """
    installed = []
    for name in names or list(_BUILDERS):
        if name in sys.modules:
            continue
        try:
            __import__(name)
            continue  # real package exists
        except ImportError:
            pass
        mod, submods = _BUILDERS[name]()
        sys.modules[name] = mod
        for subname, submod in submods.items():
            sys.modules[subname] = submod
        installed.append(name)
    return installed

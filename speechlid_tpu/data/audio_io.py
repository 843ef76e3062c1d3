"""Audio file I/O (host).

The reference loads via torchaudio's sox backend (mp3/wav); this image has
no torchaudio/soundfile, so WAV decode uses scipy (int16/float conversion to
torchaudio's float32 [-1, 1] convention).  Other codecs can be plugged via
``register_reader``.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Tuple

import numpy as np
from scipy.io import wavfile

_READERS: Dict[str, Callable[[str], Tuple[np.ndarray, int]]] = {}


def register_reader(ext: str, fn: Callable[[str], Tuple[np.ndarray, int]]):
    _READERS[ext.lower()] = fn


def _read_wav_scipy(path: str) -> Tuple[np.ndarray, int]:
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:  # (T, C) → mono first channel (torchaudio loads (C, T))
        data = data[:, 0]
    return data, int(sr)


register_reader(".wav", _read_wav_scipy)


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """→ (float32 mono waveform (T,), sample_rate)."""
    ext = os.path.splitext(path)[1].lower()
    reader = _READERS.get(ext)
    if reader is None:
        raise ValueError(
            f"no reader registered for {ext!r} (have {sorted(_READERS)})"
        )
    return reader(path)


def write_wav(path: str, wav: np.ndarray, sr: int) -> None:
    """Write PCM16 (the stdlib ``wave`` header reader can't parse IEEE-float
    WAVs, and PCM16 is what the reference corpora use)."""
    pcm = (np.clip(wav, -1.0, 1.0) * 32767.0).astype(np.int16)
    wavfile.write(path, sr, pcm)


def wav_duration(path: str) -> float:
    """Duration in seconds; header-only for PCM, full decode fallback for
    float-format WAVs."""
    import wave

    try:
        with wave.open(path, "rb") as f:
            return f.getnframes() / f.getframerate()
    except wave.Error:
        data, sr = read_wav(path)
        return len(data) / sr

"""Native WAV decoder (csrc/wavio) — golden parity vs the scipy reader.

The reference decodes via torchaudio's C++ sox backend; the rebuild's
native feeder decode must be bit-identical to the Python reference for
every supported encoding, fall back gracefully, and pad batches exactly.
"""

import os
import struct

import numpy as np
import pytest
from scipy.io import wavfile

from speechlid_tpu.data.audio_io import (
    _load_wavio,
    _read_wav_native,
    _read_wav_scipy,
    read_wav,
    read_wav_batch,
    write_wav,
)

SR = 16000


@pytest.fixture(scope="module")
def native_available():
    if _load_wavio() is None:
        pytest.skip("native wavio unavailable")


def _rand(n, seed=0):
    return (np.random.RandomState(seed).randn(n) * 0.3).clip(-1, 1)


def test_pcm16_parity(tmp_path, native_available):
    p = str(tmp_path / "a.wav")
    write_wav(p, _rand(12345).astype(np.float32), SR)
    w_n, sr_n = _read_wav_native(p)
    w_s, sr_s = _read_wav_scipy(p)
    assert (sr_n, len(w_n)) == (sr_s, len(w_s)) == (SR, 12345)
    np.testing.assert_array_equal(w_n, w_s)


def test_float32_parity(tmp_path, native_available):
    p = str(tmp_path / "f.wav")
    wavfile.write(p, 22050, _rand(5000, 1).astype(np.float32))
    w_n, sr_n = _read_wav_native(p)
    w_s, sr_s = _read_wav_scipy(p)
    assert sr_n == sr_s == 22050
    np.testing.assert_array_equal(w_n, w_s)


def test_stereo_channel0_parity(tmp_path, native_available):
    p = str(tmp_path / "s.wav")
    stereo = np.stack(
        [(_rand(4000, 2) * 32767).astype(np.int16),
         (_rand(4000, 3) * 32767).astype(np.int16)], axis=1
    )
    wavfile.write(p, 8000, stereo)
    w_n, _ = _read_wav_native(p)
    w_s, _ = _read_wav_scipy(p)  # takes channel 0
    np.testing.assert_array_equal(w_n, w_s)


def test_int32_parity(tmp_path, native_available):
    p = str(tmp_path / "i32.wav")
    wavfile.write(p, SR, (_rand(3000, 4) * 2**31 - 1).astype(np.int32))
    w_n, _ = _read_wav_native(p)
    w_s, _ = _read_wav_scipy(p)
    np.testing.assert_array_equal(w_n, w_s)


def test_pcm24_decode(tmp_path, native_available):
    """scipy's reader handles 24-bit via its own path; construct the file
    by hand and compare against the int-exact expectation."""
    vals = np.asarray([0, 1, -1, 8388607, -8388608, 4242], np.int32)
    data = b"".join(struct.pack("<i", v << 8)[1:] for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, SR, SR * 3, 3, 24)
    riff = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt +
            b"data" + struct.pack("<I", len(data)) + data)
    p = str(tmp_path / "p24.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    w_n, sr = _read_wav_native(p)
    assert sr == SR
    np.testing.assert_allclose(
        w_n, vals.astype(np.float32) / 8388608.0, rtol=0, atol=0
    )


def test_read_wav_uses_native_with_fallback(tmp_path):
    p = str(tmp_path / "r.wav")
    write_wav(p, _rand(2000).astype(np.float32), SR)
    w, sr = read_wav(p)
    np.testing.assert_array_equal(w, _read_wav_scipy(p)[0])
    # garbage file → native fails → scipy also fails → error surfaces
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"not a wav at all")
    with pytest.raises(Exception):
        read_wav(bad)


def test_batch_decode_pads_and_orders(tmp_path):
    lens = [1000, 2500, 1, 2000]
    paths = []
    for i, n in enumerate(lens):
        p = str(tmp_path / f"b{i}.wav")
        write_wav(p, _rand(n, i).astype(np.float32), SR)
        paths.append(p)
    batch, lengths, srs = read_wav_batch(paths, capacity=2500)
    assert batch.shape == (4, 2500)
    np.testing.assert_array_equal(lengths, lens)
    assert set(srs.tolist()) == {SR}
    for i, n in enumerate(lens):
        ref, _ = _read_wav_scipy(paths[i])
        np.testing.assert_array_equal(batch[i, :n], ref)
        np.testing.assert_array_equal(batch[i, n:], 0.0)


def test_batch_capacity_exceeded_raises(tmp_path):
    p = str(tmp_path / "long.wav")
    write_wav(p, _rand(4000).astype(np.float32), SR)
    with pytest.raises(ValueError, match="exceeds capacity"):
        read_wav_batch([p], capacity=1000)


def test_wavio_info(tmp_path, native_available):
    import ctypes

    p = str(tmp_path / "info.wav")
    write_wav(p, _rand(7777).astype(np.float32), SR)
    lib = _load_wavio()
    frames = ctypes.c_long()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    rc = lib.wavio_info(p.encode(), ctypes.byref(frames), ctypes.byref(sr),
                        ctypes.byref(ch))
    assert rc == 0 and frames.value == 7777 and sr.value == SR
    assert ch.value == 1

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


def test_batch_truncate(tmp_path):
    """truncate=True clips over-capacity files (feeder bucket semantics:
    per-item path is wav[:t_bucket]) instead of raising."""
    p_long = str(tmp_path / "long.wav")
    p_short = str(tmp_path / "short.wav")
    write_wav(p_long, _rand(4000, seed=1).astype(np.float32), SR)
    write_wav(p_short, _rand(500, seed=2).astype(np.float32), SR)
    batch, lengths, srs = read_wav_batch(
        [p_long, p_short], capacity=1000, truncate=True
    )
    ref, _ = _read_wav_scipy(p_long)
    np.testing.assert_array_equal(batch[0], ref[:1000])
    assert lengths.tolist() == [1000, 500]
    assert set(srs.tolist()) == {SR}


class TestFeederNativeBatch:
    """The feeder's native batch-decode path must be bit-identical to the
    per-item path (same wavs, lengths, texts, langs, paths)."""

    @pytest.fixture
    def dataset(self, tmp_path, monkeypatch):
        from tests.test_data import _write_corpus
        from speechlid_tpu.data import (
            CTCTokenizer, MergedDataset, RawManifest,
        )

        monkeypatch.setenv("SPEECHLID_CACHE_DISABLE", "1")
        paths = _write_corpus(str(tmp_path), n=6)
        mans = [RawManifest(p, max_duration=2.0, source="xf") for p in paths]
        vocabs = {m.lang(): m.export_vocab() for m in mans}
        toks = {l: CTCTokenizer(v) for l, v in vocabs.items()}
        l2i = {l: i for i, l in enumerate(sorted(vocabs))}
        return MergedDataset(mans, toks, l2i)

    def test_feeder_native_batch_parity(self, dataset):
        from speechlid_tpu.data import BucketFeeder, MultiBatchSampler

        kw = dict(buckets_s=(0.5, 1.0), max_text_len=32, arrays_only=False)
        sampler = MultiBatchSampler(dataset, batch_size=4, seed=3)
        native = BucketFeeder(dataset, sampler, native_batch_decode=True,
                              **kw)
        sampler2 = MultiBatchSampler(dataset, batch_size=4, seed=3)
        plain = BucketFeeder(dataset, sampler2, native_batch_decode=False,
                             **kw)
        assert native.native_batch_decode
        pairs = list(zip(iter(native), iter(plain)))
        assert len(pairs) > 0
        for bn, bp in pairs:
            np.testing.assert_array_equal(bn.wavs, bp.wavs)
            np.testing.assert_array_equal(bn.wav_lengths, bp.wav_lengths)
            np.testing.assert_array_equal(bn.texts, bp.texts)
            np.testing.assert_array_equal(bn.text_lengths, bp.text_lengths)
            np.testing.assert_array_equal(bn.langs, bp.langs)
            assert bn.paths == bp.paths

    def test_meta_matches_getitem(self, dataset):
        for idx in (0, 5, 11, 17):
            meta = dataset.meta(idx)
            item = dataset[idx]
            assert meta["path"] == item["path"]
            assert meta["lang"] == item["lang"]
            assert meta["lang_idx"] == item["lang_idx"]
            assert meta["sentence"] == item["sentence"]

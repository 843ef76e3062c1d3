"""Pallas fused fbank kernel: numerical parity with the XLA frontend path
(interpret mode on CPU; the real TPU lowering is exercised by bench.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from speechlid_tpu.ops import frontend
from speechlid_tpu.ops.pallas.fbank_kernel import pallas_log_mel, pallas_wav2mel


def _wav(b=2, t=16000, seed=0):
    return np.random.RandomState(seed).randn(b, t).astype(np.float32) * 0.1


class TestPallasFbank:
    def test_matches_reference_path(self):
        wav = _wav()
        got = np.asarray(pallas_log_mel(jnp.asarray(wav), interpret=True))
        ref_mel = frontend.mel_spectrogram(jnp.asarray(wav), method="dft_conv")
        ref = 10.0 * np.log10(np.maximum(np.asarray(ref_mel), 1e-10))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)

    def test_non_multiple_of_block_frames(self):
        # 8000 samples → 51 frames (< one 128-frame block)
        wav = _wav(b=1, t=8000, seed=1)
        got = np.asarray(pallas_log_mel(jnp.asarray(wav), interpret=True))
        assert got.shape == (1, 80, 51)
        ref_mel = frontend.mel_spectrogram(jnp.asarray(wav))
        ref = 10.0 * np.log10(np.maximum(np.asarray(ref_mel), 1e-10))
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)

    def test_long_audio_multi_block(self):
        # 48000 samples → 301 frames → 3 blocks
        wav = _wav(b=1, t=48000, seed=2)
        got = np.asarray(pallas_log_mel(jnp.asarray(wav), interpret=True))
        assert got.shape == (1, 80, 301)
        ref_mel = frontend.mel_spectrogram(jnp.asarray(wav))
        ref = 10.0 * np.log10(np.maximum(np.asarray(ref_mel), 1e-10))
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)

    def test_wav2mel_parity_with_clamp(self):
        wav = _wav(b=2, t=16000, seed=3)
        lengths = jnp.asarray([16000, 8000])
        got = np.asarray(
            pallas_wav2mel(jnp.asarray(wav), lengths=lengths, interpret=True)
        )
        ref = np.asarray(frontend.wav2mel(jnp.asarray(wav), lengths=lengths))
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)

    def test_production_wav2mel_pallas_method(self, monkeypatch):
        """wav2mel(method='pallas') — the production TPU path — matches the
        XLA formulation (interpret mode on CPU); SPEECHLID_FRONTEND
        overrides the auto-selection."""
        wav = jnp.asarray(_wav(b=2, t=16000, seed=5))
        lengths = jnp.asarray([16000, 12345])
        got = np.asarray(
            frontend.wav2mel(wav, lengths=lengths, method="pallas")
        )
        ref = np.asarray(
            frontend.wav2mel(wav, lengths=lengths, method="dft_conv")
        )
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)
        # auto on CPU → dft_conv; env var forces any method
        assert frontend.resolve_method("auto") == "dft_conv"
        monkeypatch.setenv("SPEECHLID_FRONTEND", "pallas")
        assert frontend.resolve_method("auto") == "pallas"
        assert frontend.resolve_method("dft_conv") == "pallas"

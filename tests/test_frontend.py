"""Golden parity tests for the device audio frontend.

torchaudio is not in the image, so goldens come from torch.stft (same backend
the reference's MelSpectrogram wraps) plus analytic signals for the mel /
kaldi paths.  Reference behavior spec: lid/audio_processor.py (see SURVEY.md).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from speechlid_tpu.ops import frontend


def _rand_wav(b=2, t=16000, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(b, t).astype(np.float32) * 0.1


class TestSTFT:
    @pytest.mark.parametrize("method", ["fft", "dft_conv"])
    def test_powspec_matches_torch_stft(self, method):
        wav = _rand_wav()
        n_fft, win, hop = 512, 400, 160
        got = np.asarray(
            frontend._stft_powspec(
                jnp.asarray(wav), n_fft, hop, win, frontend._hann_window(win),
                center=True, method=method,
            )
        )
        ref = torch.stft(
            torch.from_numpy(wav),
            n_fft=n_fft, hop_length=hop, win_length=win,
            window=torch.hann_window(win),
            center=True, pad_mode="reflect", onesided=True,
            return_complex=True,
        )
        ref_pow = (ref.abs() ** 2).transpose(1, 2).numpy()  # (B, F, bins)
        assert got.shape == ref_pow.shape
        np.testing.assert_allclose(got, ref_pow, rtol=1e-3, atol=1e-3)

    def test_fft_and_dft_conv_agree(self):
        wav = _rand_wav(t=8000)
        a = frontend.mel_spectrogram(jnp.asarray(wav), method="fft")
        b = frontend.mel_spectrogram(jnp.asarray(wav), method="dft_conv")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


class TestMel:
    def test_shapes(self):
        wav = _rand_wav(b=3, t=16000)
        mel = frontend.wav2mel(jnp.asarray(wav))
        # center=True: frames = 1 + T//hop = 1 + 100
        assert mel.shape == (3, 80, 101)

    def test_pure_tone_peaks_at_right_mel_bin(self):
        sr, f0 = 16000, 1000.0
        t = np.arange(sr) / sr
        wav = np.sin(2 * np.pi * f0 * t).astype(np.float32)[None, :]
        mel = np.asarray(frontend.mel_spectrogram(jnp.asarray(wav)))
        peak_bin = mel.mean(axis=-1).argmax()
        # expected mel bin for 1 kHz with htk scale, 80 mels over [0, 8000]
        m = 2595 * np.log10(1 + f0 / 700.0)
        m_max = 2595 * np.log10(1 + 8000.0 / 700.0)
        expected = int(m / m_max * 81) - 1
        assert abs(int(peak_bin) - expected) <= 1

    def test_amplitude_to_db_formula(self):
        x = np.abs(_rand_wav(b=2, t=200)).reshape(2, 10, 20).astype(np.float32)
        got = np.asarray(frontend.amplitude_to_db(jnp.asarray(x), top_db=80.0))
        ref = 10.0 * np.log10(np.maximum(x, 1e-10))
        peak = ref.max(axis=(1, 2), keepdims=True)
        ref = np.maximum(ref, peak - 80.0)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_length_masking_does_not_change_valid_frames(self):
        wav = _rand_wav(b=2)
        full = np.asarray(frontend.wav2mel(jnp.asarray(wav)))
        lengths = jnp.asarray([16000, 8000])
        masked = np.asarray(frontend.wav2mel(jnp.asarray(wav), lengths=lengths))
        # first utterance identical; second matches on valid *interior* frames
        # (the last ~2 frames' analysis windows straddle the pad boundary, so
        # reflect-padding of the short signal vs zero-padding of the batch
        # differ there by construction).
        np.testing.assert_allclose(masked[0], full[0], atol=1e-5)
        ref_short = np.asarray(frontend.wav2mel(jnp.asarray(wav[1:, :8000])))
        f_interior = (8000 - 256) // 160  # windows fully inside valid samples
        np.testing.assert_allclose(
            masked[1, :, :f_interior], ref_short[0, :, :f_interior],
            rtol=1e-4, atol=1e-3,
        )


class TestNormalize:
    def test_matches_torch_std_mean(self):
        wav = _rand_wav()
        got = np.asarray(frontend.normalize_wav(jnp.asarray(wav)))
        tw = torch.from_numpy(wav)
        std, mean = torch.std_mean(tw, dim=-1)
        ref = ((tw - mean[:, None]) / (std[:, None] + 1e-6)).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_masked_matches_unpadded(self):
        wav = _rand_wav(b=1, t=12000)
        padded = np.concatenate([wav, np.zeros((1, 4000), np.float32)], axis=1)
        got = np.asarray(
            frontend.normalize_wav(jnp.asarray(padded), lengths=jnp.asarray([12000]))
        )
        ref = np.asarray(frontend.normalize_wav(jnp.asarray(wav)))
        np.testing.assert_allclose(got[:, :12000], ref, rtol=1e-4, atol=1e-5)
        assert np.all(got[:, 12000:] == 0)


class TestPreemphasis:
    def test_formula(self):
        wav = _rand_wav(b=1, t=100)
        got = np.asarray(frontend.preemphasis(jnp.asarray(wav)))
        ref = np.concatenate(
            [wav[:, :1], wav[:, 1:] - 0.97 * wav[:, :-1]], axis=1
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


class TestKaldiFbank:
    def test_shape_snip_edges(self):
        wav = _rand_wav(b=2, t=16000)
        out = frontend.kaldi_fbank(jnp.asarray(wav))
        # snip_edges: 1 + (16000-400)//160 = 98 frames
        assert out.shape == (2, 98, 80)

    @pytest.mark.parametrize("method", ["fft", "dft_conv"])
    def test_tone_peak(self, method):
        sr, f0 = 16000, 2000.0
        t = np.arange(sr) / sr
        wav = np.sin(2 * np.pi * f0 * t).astype(np.float32)[None, :]
        out = np.asarray(frontend.kaldi_fbank(jnp.asarray(wav), method=method))
        peak = out.mean(axis=1).argmax()
        # kaldi mel scale over [20, 8000]
        def mel(f):
            return 1127 * np.log(1 + f / 700)
        frac = (mel(f0) - mel(20)) / (mel(8000) - mel(20))
        expected = int(frac * 81) - 1
        assert abs(int(peak) - expected) <= 1

    def test_methods_agree(self):
        wav = _rand_wav(b=2, t=8000)
        a = frontend.kaldi_fbank(jnp.asarray(wav), method="fft")
        b = frontend.kaldi_fbank(jnp.asarray(wav), method="dft_conv")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


class TestFrameLengths:
    def test_centered_and_snip(self):
        lens = jnp.asarray([16000, 8000, 399])
        np.testing.assert_array_equal(
            np.asarray(frontend.frame_lengths(lens, 160, center=True)),
            [101, 51, 3],
        )
        np.testing.assert_array_equal(
            np.asarray(frontend.frame_lengths(lens, 160, center=False, win_length=400)),
            [98, 48, 0],
        )

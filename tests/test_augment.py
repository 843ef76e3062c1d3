"""Tests for on-device augmentation ops (SpecAugment, noise, resample)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechlid_tpu.ops import augment, resample, specaugment


class TestSpecAugment:
    def test_masks_zero_out_spans(self):
        key = jax.random.PRNGKey(0)
        spec = jnp.ones((4, 80, 100))
        out = np.asarray(
            specaugment.spec_augment(key, spec, time_mask_ratio=0.3,
                                     freq_mask_param=27, n_time_masks=2,
                                     n_freq_masks=2)
        )
        assert out.shape == (4, 80, 100)
        assert (out == 0).any()  # something masked
        assert (out == 1).any()  # not everything masked
        # masked fraction bounded: 2 freq masks of <27 bins + 2 time masks of <30
        frac = (out == 0).mean()
        assert frac < 0.9

    def test_deterministic_per_key(self):
        key = jax.random.PRNGKey(42)
        spec = jnp.ones((2, 80, 50))
        a = specaugment.spec_augment(key, spec)
        b = specaugment.spec_augment(key, spec)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_zero_masks_identity(self):
        key = jax.random.PRNGKey(0)
        spec = jnp.asarray(np.random.RandomState(0).randn(2, 80, 50).astype(np.float32))
        out = specaugment.spec_augment(key, spec, n_time_masks=0, n_freq_masks=0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(spec))

    def test_phase_vocoder_rate1_identity(self):
        spec = jnp.asarray(np.random.rand(1, 80, 40).astype(np.float32))
        out = specaugment.phase_vocoder(spec, 1.0, hop_length=160, n_freq=80)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(spec))

    def test_phase_vocoder_stretches_time(self):
        spec = jnp.asarray(np.random.rand(1, 80, 40).astype(np.float32))
        out = specaugment.phase_vocoder(spec, 0.9, hop_length=160, n_freq=80)
        assert out.shape[-1] == int(np.ceil(40 / 0.9))


class TestNoise:
    def test_awgn_hits_target_snr(self):
        key = jax.random.PRNGKey(0)
        wav = jnp.asarray(np.sin(np.linspace(0, 400 * np.pi, 64000))[None, :].astype(np.float32))
        for snr in [0.0, 10.0]:
            noisy = np.asarray(augment.awgn(key, wav, snr))
            noise = noisy - np.asarray(wav)
            ps = (np.asarray(wav) ** 2).mean()
            pn = (noise ** 2).mean()
            measured = 10 * np.log10(ps / pn)
            assert abs(measured - snr) < 0.5

    def test_mix_at_snr(self):
        rng = np.random.RandomState(0)
        wav = jnp.asarray(rng.randn(2, 16000).astype(np.float32))
        noise = jnp.asarray(rng.randn(2, 16000).astype(np.float32) * 3.0)
        out = np.asarray(augment.mix_at_snr(jax.random.PRNGKey(0), wav, noise, 5.0))
        added = out - np.asarray(wav)
        ps = (np.asarray(wav) ** 2).mean(axis=1)
        pn = (added ** 2).mean(axis=1)
        snr = 10 * np.log10(ps / pn)
        np.testing.assert_allclose(snr, [5.0, 5.0], atol=0.1)

    def test_dither_bounded(self):
        wav = jnp.zeros((1, 100))
        out = np.asarray(augment.dither(jax.random.PRNGKey(0), wav, 1e-5))
        assert (out >= 0).all() and (out < 1e-5).all()

    def test_fir_reverb_identity_impulse(self):
        wav = jnp.asarray(np.random.RandomState(0).randn(1, 1000).astype(np.float32))
        rir = jnp.asarray(np.array([1.0] + [0.0] * 255, np.float32))
        out = np.asarray(augment.fir_reverb(wav, rir))
        np.testing.assert_allclose(out, np.asarray(wav), rtol=1e-4, atol=1e-5)


class TestResample:
    @pytest.mark.parametrize("orig,new", [(22050, 16000), (44100, 16000), (8000, 16000)])
    def test_tone_preserved(self, orig, new):
        f0 = 440.0
        dur = 1.0
        t = np.arange(int(orig * dur)) / orig
        wav = np.sin(2 * np.pi * f0 * t).astype(np.float32)[None, :]
        out = np.asarray(resample.resample(jnp.asarray(wav), orig, new))
        assert out.shape[-1] == int(np.ceil(wav.shape[-1] * new / orig))
        # dominant DFT bin at f0
        spec = np.abs(np.fft.rfft(out[0, new // 10 : -new // 10]))
        peak_hz = spec.argmax() / (len(out[0]) - 2 * (new // 10)) * new
        assert abs(peak_hz - f0) < 5.0

    def test_identity(self):
        wav = jnp.asarray(np.random.rand(1, 1000).astype(np.float32))
        out = resample.resample(wav, 16000, 16000)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(wav))

    def test_speed_perturb_lengths(self):
        wav = jnp.asarray(np.random.rand(2, 16000).astype(np.float32))
        out = resample.speed_perturb(wav, 16000, 0.9, output_len=17778)
        assert out.shape == (2, 17778)
        out = resample.speed_perturb(wav, 16000, 1.1, output_len=16000)
        assert out.shape == (2, 16000)
        # 1.1x speed → shorter: ceil(16000/1.1)=14546 real samples, rest zeros
        assert np.all(np.asarray(out)[:, 14600:] == 0)

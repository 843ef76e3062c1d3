"""The reference-interop shim (speechlid_tpu.compat.refstubs) lets the
ACTUAL reference code at /root/reference run in this image.

Closes three parity loops:
- shim MelSpectrogram+AmplitudeToDB == our JAX frontend (which itself
  carries golden parity vs real torchaudio, tests/test_frontend.py) — so
  shim == torchaudio by transitivity;
- the reference's own EER2/CAvg (lid/eer.py, running on the shim Metric
  base) == our metrics implementations;
- the reference supervised Conformer stack imports and runs forward.
"""

import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from speechlid_tpu.compat import install

install()
sys.path.insert(0, "/root/reference")


class TestInstall:
    def test_idempotent_and_never_shadows(self):
        # modules already registered → second call is a no-op
        assert install() == []
        import torchaudio

        assert getattr(torchaudio, "__shim__", None) == (
            "speechlid_tpu.compat.refstubs"
        )
        # a real package (torch itself) is never shadowed
        assert install(["torch"]) == []
        import torch as t2

        assert not hasattr(t2, "__shim__")


class TestMelParity:
    def test_shim_mel_matches_jax_frontend(self):
        """Reference config (lid/audio_processor.py:91-104): n_fft=512,
        win 25 ms, hop 10 ms, 80 mels, power mel → dB(top_db=80)."""
        import torchaudio

        from speechlid_tpu.ops.frontend import amplitude_to_db, wav2mel

        rng = np.random.RandomState(0)
        wav = rng.randn(3, 16000).astype(np.float32) * 0.1

        mel_t = torchaudio.transforms.MelSpectrogram(
            n_fft=512, win_length=400, hop_length=160, pad=0, n_mels=80,
            center=True, pad_mode="reflect", power=2.0, onesided=True,
        )
        db_t = torchaudio.transforms.AmplitudeToDB(top_db=80)
        ref = db_t(mel_t(torch.from_numpy(wav))).numpy()

        ours = np.asarray(
            wav2mel(jnp.asarray(wav), method="dft_conv")
        )
        assert ref.shape == ours.shape
        np.testing.assert_allclose(ref, ours, atol=2e-3, rtol=1e-4)

        # and without the clamp, via the functional pieces
        from speechlid_tpu.ops.frontend import mel_spectrogram

        raw_t = mel_t(torch.from_numpy(wav)).numpy()
        raw_j = np.asarray(mel_spectrogram(jnp.asarray(wav)))
        np.testing.assert_allclose(raw_t, raw_j, atol=1e-4, rtol=1e-4)
        del amplitude_to_db

    def test_wav_roundtrip(self, tmp_path):
        import wave

        import torchaudio

        sr = 16000
        rng = np.random.RandomState(1)
        pcm = (rng.randn(8000) * 3000).astype(np.int16)
        path = str(tmp_path / "a.wav")
        with wave.open(path, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes(pcm.tobytes())
        x, got_sr = torchaudio.load(path)
        assert got_sr == sr and x.shape == (1, 8000)
        np.testing.assert_allclose(
            x.numpy()[0], pcm.astype(np.float32) / 32768.0, atol=1e-7
        )


class TestReferenceMetricsParity:
    """lid/eer.py's EER2/CAvg (real reference code, shim Metric base)
    against our numpy implementations on random score matrices."""

    def _scores(self, n=200, c=3, seed=0):
        rng = np.random.RandomState(seed)
        target = rng.randint(0, c, size=n)
        scores = rng.rand(n, c) * 0.5
        scores[np.arange(n), target] += rng.rand(n)  # informative
        return scores, target

    def test_eer2(self):
        from lid.eer import EER2

        from speechlid_tpu.metrics.eer import EER

        scores, target = self._scores()
        ref = EER2(num_class=3)
        ours = EER(num_class=3)
        ref.update(scores.tolist(), target.tolist())
        ours.update(scores, target)
        assert abs(float(ref.compute()) - ours.compute()) < 1e-9

    def test_cavg(self):
        from lid.eer import CAvg as RefCAvg

        from speechlid_tpu.metrics.cavg import CAvg

        scores, target = self._scores(seed=7)
        ref = RefCAvg(num_class=3)
        ours = CAvg(num_class=3)
        ref.update(scores.tolist(), target.tolist())
        ours.update(scores, target)
        assert abs(float(ref.compute()) - ours.compute()) < 1e-12

    def test_cer_shim(self):
        import torchmetrics

        from speechlid_tpu.metrics.error_rate import CharErrorRate

        preds = ["abcd", "xyz", ""]
        refs = ["abce", "xyz", "q"]
        shim = torchmetrics.CharErrorRate()
        ours = CharErrorRate()
        ours.update(preds, refs)
        assert abs(float(shim(preds, refs)) - ours.compute()) < 1e-9


class TestReferenceStackRuns:
    def test_supervised_conformer_forward(self):
        from lid.conformer import ConformerModel

        m = ConformerModel(
            n_blocks=2, encoder_dim=32, dim_head=16, heads=2, n_mels=16,
            use_stochastic_depth=False,
        )
        m.eval()
        with torch.no_grad():
            out = m(torch.randn(2, 50, 16))
        assert out.shape == (2, 25, 32)

    def test_trainer_importable(self):
        from ccml.trainer import Trainer  # noqa: F401
        from lid.LidModule_ASR_Supervised import LidSuperviseModule  # noqa: F401

"""SE enhancement + standalone ASR task tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechlid_tpu.core import Trainer
from speechlid_tpu.models.se import DPRNNEnhancer, si_snr
from speechlid_tpu.tasks.asr import ASRTask, lm_param_search
from speechlid_tpu.tasks.se import SETask


class TestSiSnr:
    def test_identity_is_high(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 4000), jnp.float32)
        val = np.asarray(si_snr(x, x))
        assert (val > 50).all()

    def test_scale_invariance(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 4000), jnp.float32)
        est = x + 0.2 * jnp.asarray(rng.randn(1, 4000), jnp.float32)
        a = np.asarray(si_snr(2.5 * est, x))
        b = np.asarray(si_snr(est, x))
        np.testing.assert_allclose(a, b, atol=1e-3)


class TestSETask:
    @pytest.mark.slow
    def test_training_improves_si_snr(self):
        rng = np.random.RandomState(0)
        t = np.arange(4000) / 16000
        clean = np.stack([
            np.sin(2 * np.pi * (200 + 50 * i) * t) for i in range(8)
        ]).astype(np.float32) * 0.5
        noisy = clean + 0.3 * rng.randn(8, 4000).astype(np.float32)
        data = [{"noisy": noisy[i : i + 4], "clean": clean[i : i + 4]}
                for i in range(0, 8, 4)]
        task = SETask(enc_dim=32, n_blocks=1, hidden=32, chunk=50, lr=2e-3)
        tr = Trainer(total_epoch=8, use_progress_bar=False)
        tr.fit(task, data, data)
        m = tr._run_eval_epoch(data)
        base = float(np.mean(np.asarray(si_snr(jnp.asarray(noisy),
                                               jnp.asarray(clean)))))
        assert m["avg_val_si_snr"] > base, (m, base)

    def test_enhance_fn_shape(self):
        task = SETask(enc_dim=16, n_blocks=1, hidden=16, chunk=25)
        wav = np.random.RandomState(0).randn(2, 3000).astype(np.float32)
        variables = task.model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.asarray(wav)
        )
        fn = task.make_enhance_fn(variables)
        out = fn(wav[0])
        assert out.shape == (3000,)


class TestASRTask:
    def _batch(self, rng, vocab_size):
        return {
            "wavs": rng.randn(2, 8000).astype(np.float32),
            "wav_lengths": np.asarray([8000, 8000], np.int32),
            "texts": rng.randint(0, vocab_size, (2, 8)).astype(np.int32),
            "text_lengths": np.asarray([8, 8], np.int32),
            "langs": np.zeros(2, np.int32),
        }

    @pytest.mark.slow
    def test_single_language_ctc(self):
        vocab = [" "] + list("abcdefg")
        task = ASRTask(vocab=vocab, n_blocks=1, encoder_dim=32, heads=2,
                       dim_head=16, sub_sampling=4, head_dim_head=8,
                       head_num_head=4, lr=2e-3, schedule=None, mask_times=0)
        rng = np.random.RandomState(0)
        batch = self._batch(rng, len(vocab))
        tr = Trainer(total_epoch=2, use_progress_bar=False)
        tr.fit(task, [batch] * 3, [batch])
        res = tr.test(task, [batch])
        assert "val_wer" in res and np.isfinite(res["avg_val_loss"])

    def test_lm_search(self, tmp_path):
        from speechlid_tpu.decode import build_native_library

        if build_native_library() is None:
            pytest.skip("native lib unavailable")
        arpa = tmp_path / "u.arpa"
        arpa.write_text(
            "\\data\\\nngram 1=4\n\n\\1-grams:\n"
            "-0.1\t<s>\t-0.1\n-0.1\t</s>\n-0.4\tab\t-0.1\n-0.9\tba\t-0.1\n"
            "\n\\end\\\n"
        )
        vocab = [" ", "a", "b"]  # blank = 3
        rng = np.random.RandomState(0)
        logits = rng.randn(3, 12, 4).astype(np.float32)
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        trials = lm_param_search(
            vocab, str(arpa), lp, np.full(3, 12), ["ab", "ab", "ba"],
            n_trials=4, num_cpus=2,
        )
        assert len(trials) == 4
        assert trials[0]["cer"] <= trials[-1]["cer"]
        assert {"alpha", "beta", "beam_width", "cer"} <= set(trials[0])

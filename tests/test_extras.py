"""Secondary-task tests: mnist-style classification (sklearn digits), LSTM
LM with PPL/BPC, RML IQ classification with SNR aux loss, spec forecasting."""

import os

import numpy as np
import pytest

from speechlid_tpu.core import Trainer
from speechlid_tpu.data.text import (
    TextDataset,
    WordTokenizer,
    build_vocab,
    read_and_filter,
)
from speechlid_tpu.tasks.extras import (
    ImageClassificationTask,
    LMTask,
    RMLTask,
    SpecPredTask,
    sliding_windows,
)


class TestImageClassification:
    @pytest.mark.slow  # ~30 s cold (mnist-analog smoke; not LID-critical)
    def test_digits_accuracy(self):
        from sklearn.datasets import load_digits

        digits = load_digits()
        x = (digits.images / 16.0).astype(np.float32)[..., None]  # (N, 8, 8, 1)
        y = digits.target.astype(np.int32)
        data = [
            (x[i : i + 64], y[i : i + 64]) for i in range(0, 1024, 64)
        ]
        val = [(x[1024:1280], y[1024:1280])]
        task = ImageClassificationTask(num_classes=10, lr=1e-3)
        tr = Trainer(total_epoch=5, use_progress_bar=False)
        tr.fit(task, data, val)
        m = tr._run_eval_epoch(val)
        assert m["avg_val_acc"] > 0.8


class TestLM:
    @pytest.fixture()
    def corpus_file(self, tmp_path):
        lines = [
            "= header ignored =",
            "the cat sat on the mat",
            "the dog sat on the log every day",
            "a cat and a dog ran around the house",
            "no",
        ] * 10
        p = tmp_path / "wiki.txt"
        p.write_text("\n".join(lines))
        return str(p)

    def test_read_and_filter(self, corpus_file):
        lines = read_and_filter(corpus_file)
        assert all(not l.startswith("=") for l in lines)
        assert all(len(l.split()) >= 4 for l in lines)

    def test_vocab_and_tokenizer(self, corpus_file):
        vocab = build_vocab(corpus_file)
        tok = WordTokenizer(vocab)
        ids = tok.encoder("the cat xyz")
        assert ids[0] == tok.vocab2num[tok.BOS]
        assert ids[-1] == tok.vocab2num[tok.EOS]
        assert tok.vocab2num[tok.UNK] in ids  # xyz is OOV
        assert tok.decoder(ids) == "the cat <unk>"

    @pytest.mark.slow  # ~32 s cold; tokenizer/decode tests stay default
    def test_lm_trains_ppl_drops(self, corpus_file):
        vocab = build_vocab(corpus_file)
        tok = WordTokenizer(vocab)
        ds = TextDataset(corpus_file, tok, max_len=16)
        batches = list(ds.batches(8, seed=0))
        task = LMTask(vocab_size=len(tok), embedding_dim=16, hidden_size=32,
                      lr=5e-3)
        tr = Trainer(total_epoch=8, use_progress_bar=False)
        tr.fit(task, batches, batches)
        m = tr._run_eval_epoch(batches)
        # tiny repetitive corpus → LM should reach low perplexity
        assert m["avg_val_ppl"] < 15, m
        assert m["avg_val_bpc"] < 4.5

    def test_masking_aug_changes_tokens(self, corpus_file):
        vocab = build_vocab(corpus_file)
        tok = WordTokenizer(vocab)
        plain = TextDataset(corpus_file, tok, mask=False)
        masked = TextDataset(corpus_file, tok, mask=True, mask_prob=0.9,
                             seed=1)
        diffs = sum(
            not np.array_equal(plain[i], masked[i]) for i in range(20)
        )
        assert diffs > 0


class TestRML:
    def _data(self, n=128, t=128, classes=4, seed=0):
        rng = np.random.RandomState(seed)
        y = rng.randint(0, classes, n).astype(np.int32)
        iq = np.zeros((n, t, 2), np.float32)
        ts = np.arange(t)
        for i in range(n):
            f = 0.05 * (y[i] + 1)
            iq[i, :, 0] = np.cos(2 * np.pi * f * ts)
            iq[i, :, 1] = np.sin(2 * np.pi * f * ts)
        iq += 0.05 * rng.randn(n, t, 2)
        snr = rng.uniform(-10, 10, n).astype(np.float32)
        return [
            {"iq": iq[i : i + 32], "label": y[i : i + 32],
             "snr": snr[i : i + 32]}
            for i in range(0, n, 32)
        ]

    def test_train_loop_forward(self):
        """Fast default-gate representative: one RMLTask train_loop call
        (no fit) — finite loss + aux-metric keys."""
        import jax

        data = self._data(n=32)
        task = RMLTask(n_classes=4, base_filters=16, kernel_size=8,
                       n_blocks=2, use_rnn=False, use_snr_info=True,
                       lr=2e-3)
        variables = task.init_variables(jax.random.PRNGKey(0), data[0])
        loss, metrics, _ = task.train_loop(
            variables, data[0], rngs={"dropout": jax.random.PRNGKey(1)})
        assert np.isfinite(float(loss))

    @pytest.mark.parametrize("use_snr,use_rnn", [
        pytest.param(False, False, marks=pytest.mark.slow),  # ~34 s cold
        pytest.param(True, True, marks=pytest.mark.slow),
    ])
    def test_trains(self, use_snr, use_rnn):
        data = self._data()
        task = RMLTask(n_classes=4, base_filters=16, kernel_size=8,
                       n_blocks=2, use_rnn=use_rnn, use_snr_info=use_snr,
                       lr=2e-3)
        tr = Trainer(total_epoch=6, use_progress_bar=False)
        tr.fit(task, data, data)
        m = tr._run_eval_epoch(data)
        assert m["avg_val_acc"] > 0.7, m


class TestSpecPred:
    def _series(self, t=400, d=8):
        ts = np.arange(t)[:, None]
        freqs = np.linspace(0.01, 0.05, d)[None, :]
        return np.sin(2 * np.pi * freqs * ts).astype(np.float32)

    @pytest.mark.parametrize("model", [
        "mlp",  # the fast default-gate representative (~9 s)
        pytest.param("lstm", marks=pytest.mark.slow),
        pytest.param("causal_conv", marks=pytest.mark.slow),  # ~18 s cold
        pytest.param("cnn_lstm", marks=pytest.mark.slow),
        pytest.param("transformer", marks=pytest.mark.slow),
    ])
    def test_forecast_models_learn(self, model):
        series = self._series()
        x, y, mean, std = sliding_windows(series, win_len=16)
        data = [
            {"x": x[i : i + 64], "y": y[i : i + 64]}
            for i in range(0, 320, 64)
        ]
        task = SpecPredTask(model_name=model, feat_dim=8, win_len=16,
                            lr=3e-3)
        task.set_normalization(mean, std)
        tr = Trainer(total_epoch=6, use_progress_bar=False)
        tr.fit(task, data, data)
        m = tr._run_eval_epoch(data)
        assert m["avg_val_loss"] < 0.3, (model, m)

    def test_autoregressive_infer(self):
        series = self._series()
        x, y, mean, std = sliding_windows(series, win_len=16)
        task = SpecPredTask(model_name="mlp", feat_dim=8, win_len=16, lr=3e-3)
        task.set_normalization(mean, std)
        data = [{"x": x[:64], "y": y[:64]}]
        tr = Trainer(total_epoch=3, use_progress_bar=False)
        tr.fit(task, data, None)
        variables = {"params": tr.state.params}
        out = task.infer(variables, x[:2], pred_len=5)
        assert out.shape == (2, 5, 8)
        assert np.isfinite(out).all()


class TestPrepareSpectrum:
    """Raw-corpus utilities (reference spec_pred/data/convert.py and
    spec_pred/gen_raw_graph.py analogs)."""

    def _jsonl(self, tmp_path, t=30, d=6):
        import json

        rng = np.random.RandomState(0)
        p = tmp_path / "raw.jsonl"
        with open(p, "w") as f:
            for i in range(t):
                f.write(json.dumps({
                    "data": (100 * rng.rand(d)).astype(int).tolist(),
                    "date": f"2021-01-{i % 28 + 1:02d}",
                }) + "\n")
        return str(p)

    def test_convert_packs_series_and_dates(self, tmp_path):
        import json

        from speechlid_tpu.cli.prepare_spectrum import convert

        out = str(tmp_path / "data.npy")
        arr = convert(self._jsonl(tmp_path), out)
        assert arr.shape == (30, 6) and arr.dtype == np.int16
        loaded = np.load(out)
        np.testing.assert_array_equal(loaded, arr)
        dates = json.load(open(str(tmp_path / "data.dates.json")))
        assert len(dates) == 30 and dates[0] == "2021-01-01"
        # the packed series feeds straight into the training windowing
        from speechlid_tpu.tasks.extras import sliding_windows

        x, y, mean, std = sliding_windows(loaded.astype(np.float32),
                                          win_len=8)
        assert x.shape[1:] == (8, 6) and np.isfinite(x).all()

    def test_denoise_floors_below_threshold(self):
        from speechlid_tpu.cli.prepare_spectrum import denoise

        seg = np.array([[0.0, 100.0], [200.0, 50.0]])
        out = denoise(seg, threshold_db=80.0)  # mean 87.5 → keep >= 167.5
        assert out[1, 0] == 200.0
        assert (out[out != 200.0] == 0.0).all()

    def test_plot_writes_segment_pngs(self, tmp_path):
        pytest.importorskip("matplotlib")
        from speechlid_tpu.cli.prepare_spectrum import convert, plot

        out = str(tmp_path / "data.npy")
        convert(self._jsonl(tmp_path), out)
        pngs = plot(out, str(tmp_path / "img"), interval=10, limit=2)
        assert len(pngs) == 2 and all(os.path.getsize(p) > 0 for p in pngs)

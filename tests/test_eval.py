"""Evaluation harness tests: noise bank, batched noisy eval, LM
arbitration, sweep driver."""

import os

import numpy as np
import pytest

from speechlid_tpu.data import (
    BucketFeeder,
    CTCTokenizer,
    MergedDataset,
    MultiBatchSampler,
    RawManifest,
)
from speechlid_tpu.data.audio_io import write_wav
from speechlid_tpu.eval import LidEvaluator, NoiseBank, run_sweep
from speechlid_tpu.tasks import LidASRTask

SR = 16000


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    os.environ["SPEECHLID_CACHE_DISABLE"] = "1"
    root = tmp_path_factory.mktemp("eval_corpus")
    rng = np.random.RandomState(0)
    manifests = []
    for li, lang in enumerate(["aa", "bb"]):
        d = root / lang / "wav" / "train"
        d.mkdir(parents=True)
        lines = []
        for i in range(6):
            t = np.arange(int(SR * 0.4)) / SR
            wav = 0.4 * np.sin(2 * np.pi * (200 + 150 * li) * t)
            write_wav(str(d / f"u{i}.wav"), wav.astype(np.float32), SR)
            lines.append(f"u{i}.wav\tab ba")
        (root / lang / "train.txt").write_text("\n".join(lines))
        manifests.append(str(root / lang / "train.txt"))

    # noise files
    noise_dir = root / "noise"
    noise_dir.mkdir()
    for name in ["white", "babble"]:
        write_wav(
            str(noise_dir / f"{name}.wav"),
            rng.randn(SR).astype(np.float32) * 0.1, SR,
        )

    ms = [RawManifest(p, max_duration=2.0, source="xf") for p in manifests]
    vocabs = {m.lang(): m.export_vocab() for m in ms}
    toks = {l: CTCTokenizer(v) for l, v in vocabs.items()}
    lang2index = {l: i for i, l in enumerate(sorted(vocabs))}
    lang2vocab = {l: len(v) for l, v in vocabs.items()}
    ds = MergedDataset(ms, toks, lang2index)

    task = LidASRTask(
        lang2vocab=lang2vocab, lang2index=lang2index, tokenizers=toks,
        n_blocks=1, encoder_dim=32, heads=2, dim_head=16, sub_sampling=4,
        head_dim_head=8, head_num_head=4, lr=1e-3, schedule=None,
    )
    import jax

    feeder = BucketFeeder(
        ds, MultiBatchSampler(ds, 4, seed=0), buckets_s=(0.5,),
        max_text_len=16,
    )
    # eval only needs INITIALIZED variables — skip the train-step
    # backward compile (was ~80 s of fixture setup on this box)
    sample_batch = next(iter(feeder))
    variables = task.init_variables(jax.random.PRNGKey(0), sample_batch)

    def feeder_factory(arrays_only=False):
        return BucketFeeder(
            ds, MultiBatchSampler(ds, 4, seed=1), buckets_s=(0.5,),
            max_text_len=16, arrays_only=arrays_only,
        )

    noise_bank = NoiseBank(
        {"white": str(noise_dir / "white.wav"),
         "babble": str(noise_dir / "babble.wav")}
    )
    return task, variables, feeder_factory, noise_bank


class TestNoiseBank:
    def test_sample_shapes_and_tiling(self, setup):
        _, _, _, bank = setup
        out = bank.sample("white", SR * 3, 2)  # longer than the 1 s noise
        assert out.shape == (2, SR * 3)
        assert out.std() > 0


class TestEvaluator:
    def test_clean_eval(self, setup):
        task, variables, feeder_factory, bank = setup
        ev = LidEvaluator(task, variables, noise_bank=bank)
        res = ev.evaluate(feeder_factory())
        assert res.n_utts == 12
        assert 0 <= res.acc <= 1
        assert np.isfinite(res.cer)
        assert res.records and "hyp" in res.records[0]

    def test_noisy_eval_runs(self, setup):
        task, variables, feeder_factory, bank = setup
        ev = LidEvaluator(task, variables, noise_bank=bank)
        res = ev.evaluate(feeder_factory(), snr_db=5.0, noise="white")
        assert res.n_utts == 12

    def test_snr_without_noise_raises(self, setup):
        """A result labeled SNR=x must never secretly be clean audio:
        requesting an SNR with no noise bank/name is an error, not a
        silent clean eval."""
        task, variables, feeder_factory, bank = setup
        ev = LidEvaluator(task, variables)  # no noise bank
        with pytest.raises(ValueError):
            ev.evaluate(feeder_factory(), snr_db=5.0, noise="white")
        ev2 = LidEvaluator(task, variables, noise_bank=bank)
        with pytest.raises(ValueError):
            ev2.evaluate(feeder_factory(), snr_db=5.0)  # no noise name

    def test_lm_select_keeps_argmax_when_no_finite_ppl(self, setup):
        """All-inf perplexities (missing LMs / blank decodes) must keep
        the model's own argmax, not force language index 0."""
        import numpy as np

        task, variables, feeder_factory, bank = setup

        class _InfLM:
            def perplexity(self, text):
                return float("inf")

        ev = LidEvaluator(task, variables,
                          lms={l: _InfLM() for l in task.lang2index})
        logits_all = np.zeros(
            (len(task.lang2index), 10, max(task.vocab_sizes) + 1), np.float32)
        assert ev._lm_select(logits_all, 10, default=2) == 2

    def test_lm_select_tie_keeps_argmax(self, setup):
        """All-OOV decodes give identical pure-<unk> perplexity under
        every LM; the tie carries no evidence, so the model's own argmax
        must survive (a bare argmin would force dict-order language 0)."""
        import numpy as np

        task, variables, feeder_factory, bank = setup

        class _ConstLM:
            def perplexity(self, text):
                return 42.0

        ev = LidEvaluator(task, variables,
                          lms={l: _ConstLM() for l in task.lang2index})
        tok = next(iter(task.tokenizers.values()))
        ch = next(i for i, c in tok.labels_map.items() if c.strip())
        logits_all = np.zeros(
            (len(task.lang2index), 10, max(task.vocab_sizes) + 1), np.float32)
        logits_all[..., ch] = 5.0  # non-space decode so ppl is consulted
        assert ev._lm_select(logits_all, 10, default=1) == 1

    def test_lm_select_unique_min_overrides_argmax(self, setup):
        import numpy as np

        task, variables, feeder_factory, bank = setup
        class _LM:
            def __init__(self, p):
                self.p = p

            def perplexity(self, text):
                return self.p

        langs = sorted(task.lang2index, key=task.lang2index.get)
        lms = {l: _LM(5.0 if i == 0 else 50.0) for i, l in enumerate(langs)}
        ev = LidEvaluator(task, variables, lms=lms)
        tok = next(iter(task.tokenizers.values()))
        ch = next(i for i, c in tok.labels_map.items() if c.strip())
        logits_all = np.zeros(
            (len(task.lang2index), 10, max(task.vocab_sizes) + 1), np.float32)
        logits_all[..., ch] = 5.0
        assert ev._lm_select(logits_all, 10, default=1) == 0

    def test_csv_dump(self, setup, tmp_path):
        task, variables, feeder_factory, bank = setup
        ev = LidEvaluator(task, variables, noise_bank=bank)
        path = str(tmp_path / "res.csv")
        ev.evaluate(feeder_factory(), csv_path=path)
        lines = open(path).read().strip().splitlines()
        assert len(lines) == 13  # header + 12 utts
        assert "pred_lang" in lines[0]

    def test_lm_arbitration_triggers(self, setup, tmp_path):
        from speechlid_tpu.decode import NgramLM, build_native_library

        if build_native_library() is None:
            pytest.skip("native lib unavailable")
        task, variables, feeder_factory, bank = setup
        arpa = tmp_path / "flat.arpa"
        arpa.write_text(
            "\\data\\\nngram 1=3\n\n\\1-grams:\n"
            "-0.1\t<s>\t-0.1\n-0.1\t</s>\n-0.5\tab\t-0.1\n\n\\end\\\n"
        )
        lms = {l: NgramLM(str(arpa)) for l in task.lang2index}
        # threshold 1.0 → every utterance is "ambiguous" → all arbitrated
        ev = LidEvaluator(task, variables, lms=lms, kenlm_threshold=1.0,
                          noise_bank=bank)
        res = ev.evaluate(feeder_factory())
        assert res.lm_arbitrated == res.n_utts

    def test_lm_arbitration_with_kenlm_binary(self, setup):
        """Arbitration end-to-end with a KenLM *binary* probing model —
        the reference's actual LM artifact format (lid/test.py:58-60)."""
        from speechlid_tpu.decode import NgramLM, build_native_library

        if build_native_library() is None:
            pytest.skip("native lib unavailable")
        klm = os.path.join(os.path.dirname(__file__), "data",
                           "tiny_probing.klm")
        task, variables, feeder_factory, bank = setup
        lms = {l: NgramLM(klm) for l in task.lang2index}
        ev = LidEvaluator(task, variables, lms=lms, kenlm_threshold=1.0,
                          noise_bank=bank)
        res = ev.evaluate(feeder_factory())
        assert res.lm_arbitrated == res.n_utts

    def test_enhance_hook_called(self, setup):
        task, variables, feeder_factory, bank = setup
        calls = []

        def fake_se(wav):
            calls.append(1)
            return wav * 0.5

        ev = LidEvaluator(task, variables, noise_bank=bank,
                          enhance_fn=fake_se, enhance_factor=0.4)
        ev.evaluate(feeder_factory(), snr_db=0.0, noise="babble")
        assert calls  # hook exercised


class TestSweep:
    def test_grid(self, setup, tmp_path):
        task, variables, feeder_factory, bank = setup
        ev = LidEvaluator(task, variables, noise_bank=bank)
        out = str(tmp_path / "sweep.jsonl")
        rows = run_sweep(
            ev, feeder_factory, snrs=(0.0, 10.0),
            noises=("white", "nonexistent"), out_path=out,
        )
        # clean + 2 SNRs × 1 available noise
        assert len(rows) == 3
        assert rows[0]["noise"] == "clean"
        assert os.path.getsize(out) > 0

    def test_factor_sweep(self, setup, tmp_path):
        from speechlid_tpu.eval import run_factor_sweep

        task, variables, feeder_factory, bank = setup

        def fake_se(wav):
            return wav * 0.5

        ev = LidEvaluator(task, variables, noise_bank=bank,
                          enhance_fn=fake_se, enhance_factor=0.9)
        out = str(tmp_path / "factor.jsonl")
        rows = run_factor_sweep(
            ev, feeder_factory, factors=(0.0, 0.5, 1.0),
            snr=0.0, noise="white", out_path=out,
        )
        assert [r["factor"] for r in rows] == [0.0, 0.5, 1.0]
        assert all(r["noise"] == "white" for r in rows)
        assert ev.enhance_factor == 0.9  # restored after the sweep
        assert os.path.getsize(out) > 0

    def test_factor_sweep_requires_se(self, setup):
        from speechlid_tpu.eval import run_factor_sweep

        task, variables, feeder_factory, bank = setup
        ev = LidEvaluator(task, variables, noise_bank=bank)
        with pytest.raises(ValueError):
            run_factor_sweep(ev, feeder_factory, factors=(0.0,))

    def test_factor_sweep_cli_arg_validation(self):
        """Bad --factor-sweep specs must die in argparse, BEFORE the
        minutes-long checkpoint/model load."""
        from speechlid_tpu.cli.test_lid import main as tl_main

        base = ["--ckpt", "x.ckpt", "--config-dir", "c", "--config-name",
                "n", "--se-ckpt", "s.ckpt"]
        for bad in ("0:1", "0:1:0", "a:b:c"):
            with pytest.raises(SystemExit):
                tl_main(base + ["--factor-sweep", bad])
        with pytest.raises(SystemExit):  # missing --se-ckpt
            tl_main(["--ckpt", "x.ckpt", "--config-dir", "c",
                     "--config-name", "n", "--factor-sweep", "0:1:0.5"])

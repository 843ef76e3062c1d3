"""End-to-end LID task tests: synthetic on-disk corpus → manifests →
feeder → Trainer.fit for both the joint CTC-ASR task and the CE task."""

import os

import numpy as np
import pytest

from speechlid_tpu.core import Trainer
from speechlid_tpu.data import (
    BucketFeeder,
    CTCTokenizer,
    MergedDataset,
    MultiBatchSampler,
    RawManifest,
)
from speechlid_tpu.data.audio_io import write_wav
from speechlid_tpu.tasks import LidASRTask, LidCrossEntropyTask
from speechlid_tpu.tasks.lid_asr import normalize_scores

SR = 16000
LANG_TEXTS = {
    "aa": ["ba ba", "ab ab", "baba"],
    "bb": ["cd cd", "dc dc", "cdcd"],
    "cc": ["ef ef", "fe fe", "efef"],
}


def _corpus(root, n=8):
    manifests = []
    rng = np.random.RandomState(0)
    for li, (lang, texts) in enumerate(sorted(LANG_TEXTS.items())):
        d = os.path.join(root, lang)
        wav_dir = os.path.join(d, "wav", "train")
        os.makedirs(wav_dir, exist_ok=True)
        lines = []
        for i in range(n):
            name = f"utt{i}.wav"
            dur = 0.4 + 0.1 * (i % 2)
            t = np.arange(int(SR * dur)) / SR
            f0 = (150 + 150 * li) * (1 + 0.05 * rng.randn())
            wav = sum(
                rng.rand() / h * np.sin(2 * np.pi * f0 * h * t)
                for h in range(1, 6)
            ) + 0.01 * rng.randn(len(t))
            write_wav(os.path.join(wav_dir, name), wav.astype(np.float32), SR)
            lines.append(f"{name}\t{texts[i % len(texts)]}")
        mpath = os.path.join(d, "train.txt")
        with open(mpath, "w") as f:
            f.write("\n".join(lines))
        manifests.append(mpath)
    return manifests


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    os.environ["SPEECHLID_CACHE_DISABLE"] = "1"
    paths = _corpus(str(root))
    manifests = [RawManifest(p, max_duration=2.0, source="xf") for p in paths]
    vocabs = {m.lang(): m.export_vocab() for m in manifests}
    toks = {l: CTCTokenizer(v) for l, v in vocabs.items()}
    lang2index = {l: i for i, l in enumerate(sorted(vocabs))}
    lang2vocab = {l: len(v) for l, v in vocabs.items()}
    ds = MergedDataset(manifests, toks, lang2index)
    return ds, toks, lang2index, lang2vocab


def _feeder(ds, batch=4, seed=0):
    sampler = MultiBatchSampler(ds, batch_size=batch, seed=seed)
    return BucketFeeder(ds, sampler, buckets_s=(0.5,), max_text_len=16)


class TestLidASRTask:
    @pytest.mark.slow  # full fit+eval+infer compile ~166 s cold on 1 CPU;
    # default-gate LidASR coverage: bn_update/normalize_scores here, the
    # CE-task [linear] full fit below, Trainer.fit in test_trainer.py
    def test_fit_and_val_metrics(self, corpus):
        ds, toks, lang2index, lang2vocab = corpus
        task = LidASRTask(
            lang2vocab=lang2vocab, lang2index=lang2index, tokenizers=toks,
            n_blocks=1, encoder_dim=48, heads=2, dim_head=24,
            sub_sampling=4, head_dim_head=12, head_num_head=4,
            lr=2e-3, schedule=None, mask_times=1,
        )
        tr = Trainer(total_epoch=2, use_progress_bar=False, seed=0)
        tr.fit(task, _feeder(ds), _feeder(ds))
        m = tr._run_eval_epoch(_feeder(ds))
        # all reference metric keys present and finite
        for key in ("avg_val_loss", "val_acc", "val_wer", "eer", "cavg"):
            assert key in m, m
        assert np.isfinite(m["avg_val_loss"])
        assert 0 <= m["eer"] <= 1 and 0 <= m["cavg"] <= 1

    @pytest.mark.slow
    def test_loss_decreases(self, corpus):
        ds, toks, lang2index, lang2vocab = corpus
        task = LidASRTask(
            lang2vocab=lang2vocab, lang2index=lang2index, tokenizers=toks,
            n_blocks=1, encoder_dim=48, heads=2, dim_head=24,
            sub_sampling=4, head_dim_head=12, head_num_head=4,
            lr=3e-3, schedule=None, mask_times=0,
        )
        tr = Trainer(total_epoch=6, use_progress_bar=False, seed=0)
        losses = []
        orig = task.train_loop_end

        def capture(outputs):
            r = orig(outputs)
            losses.append(r.get("avg_train_loss", np.nan))
            return r

        task.train_loop_end = capture
        tr.fit(task, _feeder(ds), None)
        assert losses[-1] < losses[0]

    @pytest.mark.slow
    def test_freeze_featurizer(self, corpus):
        import jax

        ds, toks, lang2index, lang2vocab = corpus
        task = LidASRTask(
            lang2vocab=lang2vocab, lang2index=lang2index, tokenizers=toks,
            n_blocks=1, encoder_dim=48, heads=2, dim_head=24,
            sub_sampling=4, head_dim_head=12, head_num_head=4,
            lr=5e-3, schedule=None, freeze_featurizer_epoch=10,
        )
        tr = Trainer(total_epoch=2, use_progress_bar=False, seed=0)
        feeder = _feeder(ds)
        tr.trainer_prepare(task, next(iter(feeder)))
        init_feat = jax.device_get(tr.state.params["featurizer"])
        tr.fit(task, feeder, None)
        final_feat = jax.device_get(tr.state.params["featurizer"])
        for a, b in zip(jax.tree_util.tree_leaves(init_feat),
                        jax.tree_util.tree_leaves(final_feat)):
            np.testing.assert_array_equal(a, b)

    def test_bn_update_loop_refreshes_stats(self, corpus):
        import jax

        ds, toks, lang2index, lang2vocab = corpus
        task = LidASRTask(
            lang2vocab=lang2vocab, lang2index=lang2index, tokenizers=toks,
            n_blocks=1, encoder_dim=48, heads=2, dim_head=24,
            sub_sampling=4, head_dim_head=12, head_num_head=4,
            lr=2e-3, schedule=None, mask_times=0,
        )
        batch = next(iter(_feeder(ds)))
        variables = task.init_variables(jax.random.PRNGKey(0), batch)
        stats = task.bn_update_loop(variables, batch)
        # fresh init is mean=0/var=1; one pass must move them
        leaves = jax.tree_util.tree_leaves(stats)
        assert leaves and any(
            not np.allclose(np.asarray(l), 0.0)
            and not np.allclose(np.asarray(l), 1.0)
            for l in leaves
        )
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)

    @pytest.mark.slow
    def test_swa_bn_reestimation_runs(self, corpus):
        """Trainer._finalize_swa must call bn_update_loop and refresh
        batch_stats (reference trainer.py:647-665 BN pass)."""
        import jax

        ds, toks, lang2index, lang2vocab = corpus
        task = LidASRTask(
            lang2vocab=lang2vocab, lang2index=lang2index, tokenizers=toks,
            n_blocks=1, encoder_dim=48, heads=2, dim_head=24,
            sub_sampling=4, head_dim_head=12, head_num_head=4,
            lr=2e-3, schedule=None, mask_times=0,
        )
        tr = Trainer(total_epoch=2, use_swa=True, swa_start_ratio=0.5,
                     use_progress_bar=False, seed=0)
        tr.fit(task, _feeder(ds), None)
        stats = jax.device_get(tr.state.model_state["batch_stats"])
        leaves = jax.tree_util.tree_leaves(stats)
        assert leaves and all(
            np.all(np.isfinite(np.asarray(l))) for l in leaves
        )

    def test_normalize_scores(self):
        s = np.asarray([[-0.02, -0.5, -0.7]])
        p = normalize_scores(s)
        np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)
        assert p[0, 0] > p[0, 1] > p[0, 2]  # higher confidence → higher prob


class TestLidCrossEntropyTask:
    @pytest.mark.parametrize("backend", [
        pytest.param("xvector", marks=pytest.mark.slow),  # ~49 s cold
        "linear",  # the default-gate full-fit representative (~13 s)
    ])
    def test_fit_and_metrics(self, corpus, backend):
        ds, toks, lang2index, lang2vocab = corpus
        task = LidCrossEntropyTask(
            num_classes=3, backend=backend, lr=1e-3, mask_times=0
        )
        tr = Trainer(total_epoch=3, use_progress_bar=False, seed=0)
        tr.fit(task, _feeder(ds), _feeder(ds))
        m = tr._run_eval_epoch(_feeder(ds))
        for key in ("avg_val_loss", "val_acc", "eer", "cavg"):
            assert key in m
        assert np.isfinite(m["avg_val_loss"])

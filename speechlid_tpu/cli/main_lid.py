"""Train / evaluate LID models from a YAML config tree.

Reference: lid/main.py:23 (joint ASR-LID, hydra ``conf/xf_asr_lid``) and
lid/main_cross.py:21 (CE classifiers).  Uses the hydra-compatible config
loader (core/config.py) with the same group schema
(trainer / model / module / data / logger / stage) and ``key=value`` CLI
overrides.

Usage:
    python -m speechlid_tpu.cli.main_lid --config-dir configs \
        --config-name lid_supervised [trainer.total_epoch=10 ...]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import Dict, List

from speechlid_tpu.core import Trainer, load_config
from speechlid_tpu.core.callbacks import CkptCallback, LrCallback, ProfileCallback
from speechlid_tpu.core.loggers import ConsoleLogger, JsonlLogger, Logger
from speechlid_tpu.data import (
    BucketFeeder,
    CTCTokenizer,
    MergedDataset,
    MultiBatchSampler,
    RawManifest,
)


def build_data(conf) -> Dict:
    """Per-language train (+optional val) manifests → merged datasets
    (the reference builds one MergedDataset per split, lid/main.py:82-108)."""
    train_manifests, val_manifests, tokenizers = [], [], {}
    lang2index, lang2vocab = {}, {}
    for i, lang_conf in enumerate(conf.data.langs):
        m = RawManifest(
            lang_conf.manifest,
            max_duration=conf.data.get("max_duration", 16.7),
            train=True,
            source=conf.data.get("source", "xf"),
        )
        train_manifests.append(m)
        lang = m.lang()
        lang2index[lang] = i
        vocab = lang_conf.get("vocab") if isinstance(lang_conf, dict) else None
        tok = CTCTokenizer(vocab if vocab else m.export_vocab())
        tokenizers[lang] = tok
        lang2vocab[lang] = tok.vocab_size
        val_path = (
            lang_conf.get("val_manifest") if isinstance(lang_conf, dict) else None
        )
        if val_path:
            val_manifests.append(
                RawManifest(
                    val_path,
                    max_duration=conf.data.get("max_duration_eval", 16.7),
                    train=False,
                    source=conf.data.get("source", "xf"),
                )
            )
    dataset = MergedDataset(train_manifests, tokenizers, lang2index)
    val_dataset = (
        MergedDataset(val_manifests, tokenizers, lang2index)
        if val_manifests
        else None
    )
    return {
        "dataset": dataset,
        "val_dataset": val_dataset,
        "tokenizers": tokenizers,
        "lang2index": lang2index,
        "lang2vocab": lang2vocab,
    }


def build_feeder(conf, dataset, seed=0, train=True) -> BucketFeeder:
    sampler = MultiBatchSampler(
        dataset,
        batch_size=conf.data.get("batch_size", 8),
        drop_last=conf.data.get("drop_last", False),
        seed=seed,
        shard_id=int(os.environ.get("SPEECHLID_SHARD_ID", 0)),
        num_shards=int(os.environ.get("SPEECHLID_NUM_SHARDS", 1)),
    )
    augmentor = None
    aug_conf = conf.data.get("wav_augment") if train else None
    if aug_conf:
        from speechlid_tpu.data.augmentor import WavAugmentor

        augmentor = WavAugmentor(
            sample_rate=conf.data.get("sample_rate", 16000),
            **(aug_conf.to_dict() if hasattr(aug_conf, "to_dict")
               else dict(aug_conf)),
        )
    return BucketFeeder(
        dataset,
        sampler,
        sample_rate=conf.data.get("sample_rate", 16000),
        buckets_s=tuple(conf.data.get("buckets_s", [2.0, 4.0, 8.0, 13.0, 17.0])),
        max_text_len=conf.data.get("max_text_len", 256),
        augmentor=augmentor,
    )


def build_task(conf, data):
    module_conf = conf.module.to_dict() if hasattr(conf.module, "to_dict") else dict(conf.module)
    task_type = module_conf.pop("task", "lid_asr")
    if task_type == "lid_asr":
        from speechlid_tpu.tasks import LidASRTask

        return LidASRTask(
            lang2vocab=data["lang2vocab"],
            lang2index=data["lang2index"],
            tokenizers=data["tokenizers"],
            **module_conf,
        )
    if task_type == "lid_cross_entropy":
        from speechlid_tpu.tasks import LidCrossEntropyTask

        return LidCrossEntropyTask(
            num_classes=len(data["lang2index"]), **module_conf
        )
    if task_type == "asr":
        from speechlid_tpu.tasks.asr import ASRTask

        lang = next(iter(data["tokenizers"]))
        return ASRTask(
            vocab=data["tokenizers"][lang].export_vocab(), **module_conf
        )
    raise ValueError(f"unknown module.task: {task_type}")


def main(argv: List[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-dir", default="configs")
    parser.add_argument("--config-name", required=True)
    parser.add_argument("overrides", nargs="*", help="key=value overrides")
    args = parser.parse_args(argv)

    from speechlid_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    conf = load_config(args.config_dir, args.config_name, args.overrides)
    logging.basicConfig(
        level=getattr(logging, str(conf.get("log_level", "INFO"))),
        format="%(asctime)s %(levelname)s %(message)s",
        force=True,  # jax.config.update may have installed a root handler
    )
    logging.info("config: %s", conf.to_dict())

    data = build_data(conf)
    task = build_task(conf, data)

    exp_dir = conf.get("exp_dir", "exp/default")
    callbacks = [
        CkptCallback(
            os.path.join(exp_dir, "ckpt"),
            monitor=conf.trainer.get("monitor", "avg_val_loss"),
            mode=conf.trainer.get("monitor_mode", "min"),
            save_topk=conf.trainer.get("save_topk", 3),
        ),
        LrCallback(),
        ProfileCallback(),
    ]
    logger = Logger(
        [ConsoleLogger(), JsonlLogger(os.path.join(exp_dir, "metrics.jsonl"))],
        train_interval=conf.trainer.get("log_interval", 10),
    )

    # trainer.data_parallel: true  → batch sharded over all devices
    # trainer.model_parallel: N    → 'model' axis of size N carrying the
    # tp kernel splits and ep expert-head sharding (parallel/sharding.py)
    mesh, param_rules = None, None
    model_parallel = int(conf.trainer.get("model_parallel", 1))
    if conf.trainer.get("data_parallel", False) or model_parallel > 1:
        from speechlid_tpu.parallel import make_mesh

        mesh = make_mesh(model=model_parallel)
        if model_parallel > 1:
            from speechlid_tpu.parallel import (
                CONFORMER_TP_RULES, EP_RULES, WAVLM_TP_RULES,
            )

            param_rules = EP_RULES + CONFORMER_TP_RULES + WAVLM_TP_RULES

    trainer = Trainer(
        total_epoch=conf.trainer.get("total_epoch", 10),
        accum_grad=conf.trainer.get("accum_grad", 1),
        eval_interval=conf.trainer.get("eval_interval", 1),
        train_data_factor=conf.trainer.get("train_data_factor", 1.0),
        use_swa=conf.trainer.get("use_swa", False),
        swa_start_ratio=conf.trainer.get("swa_start_ratio", 0.7),
        lr_exec_mode=conf.trainer.get("lr_exec_mode", "step"),
        seed=conf.get("seed", 0),
        callbacks=callbacks,
        loggers=logger,
        mesh=mesh,
        param_rules=param_rules,
        checkpoint_path=conf.trainer.get("resume_from") or None,
        use_progress_bar=conf.trainer.get("progress_bar", True),
    )

    stage = conf.get("stage", "train")
    train_feeder = build_feeder(conf, data["dataset"], seed=conf.get("seed", 0))
    val_feeder = (
        build_feeder(conf, data["val_dataset"], seed=conf.get("seed", 0),
                     train=False)
        if data["val_dataset"] is not None
        else train_feeder
    )
    if stage == "train":
        trainer.fit(task, train_feeder, val_feeder)
    elif stage == "test":
        trainer.test(task, val_feeder)
    else:
        raise ValueError(f"unknown stage: {stage}")
    logger.finish()


if __name__ == "__main__":
    main()

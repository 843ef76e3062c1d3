"""End-to-end CLI smoke: ``main_lid.main()`` trains a tiny supervised
joint LID from a YAML config on a synthetic 2-language corpus — once
data-parallel and once with ``trainer.model_parallel=2`` (tp+ep layouts
via Trainer param_rules).  Mirrors the reference's hydra entry
(lid/main.py:23) driven exactly as a user would."""

import json
import os

import numpy as np
import pytest


SR = 16000


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from speechlid_tpu.data.audio_io import write_wav

    root = tmp_path_factory.mktemp("cli_corpus")
    rng = np.random.RandomState(0)
    texts = {"aa": ["ba ba", "ab"], "bb": ["cd cd", "dc"]}
    for li, (lang, txts) in enumerate(sorted(texts.items())):
        wav_dir = root / lang / "wav" / "train"
        wav_dir.mkdir(parents=True)
        lines = []
        for i in range(8):
            t = np.arange(int(SR * 0.9)) / SR
            wav = (np.sin(2 * np.pi * (150 + 200 * li) * t)
                   + 0.01 * rng.randn(len(t))).astype(np.float32) * 0.3
            write_wav(str(wav_dir / f"u{i}.wav"), wav, SR)
            lines.append(f"u{i}.wav\t{txts[i % len(txts)]}")
        (root / lang / "train.txt").write_text("\n".join(lines))
    return root


def _conf_dir(tmp_path, corpus):
    d = tmp_path / "conf"
    d.mkdir()
    langs = "\n".join(
        f"    - manifest: {corpus / lang / 'train.txt'}\n"
        f"      val_manifest: {corpus / lang / 'train.txt'}"
        for lang in ("aa", "bb")
    )
    (d / "tiny.yaml").write_text(f"""model_name: tiny
experiment_name: tiny
stage: train
trainer:
  total_epoch: 1
  progress_bar: false
  save_topk: 1
module:
  task: lid_asr
  n_blocks: 1
  encoder_dim: 32
  heads: 2
  dim_head: 16
  sub_sampling: 4
  head_dim_head: 8
  head_num_head: 4
  mask_times: 0
  lr: 1.0e-3
  schedule: null
data:
  source: xf
  sample_rate: 16000
  batch_size: 4
  max_duration: 2.0
  max_duration_eval: 2.0
  max_text_len: 16
  buckets_s: [1.0]
  langs:
{langs}
""")
    return d


@pytest.mark.parametrize("overrides", [
    # both ~100 s cold each on 1 CPU (full CLI train+eval compile);
    # config plumbing stays default-gated via test_configs.py
    pytest.param([], id="default", marks=pytest.mark.slow),
    pytest.param(["trainer.model_parallel=2"], marks=pytest.mark.slow,
                 id="model_parallel"),
])
def test_main_lid_end_to_end(corpus, tmp_path, overrides, monkeypatch):
    from speechlid_tpu.cli.main_lid import main

    monkeypatch.setenv("SPEECHLID_CACHE_DISABLE", "1")
    exp = tmp_path / "exp"
    main([
        "--config-dir", str(_conf_dir(tmp_path, corpus)),
        "--config-name", "tiny",
        f"exp_dir={exp}",
    ] + overrides)
    # checkpoint written
    assert (exp / "ckpt" / "last.ckpt").exists()
    # metrics logged with finite losses
    lines = [json.loads(l) for l in
             (exp / "metrics.jsonl").read_text().splitlines()]
    val = [l for l in lines if "avg_val_loss" in l]
    assert val and np.isfinite(val[-1]["avg_val_loss"])
    assert "eer" in val[-1] and "cavg" in val[-1]

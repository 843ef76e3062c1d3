"""Recipe smoke tests: every YAML under configs/ must load through the
hydra-compatible config loader and construct its task (SSL shapes downsized
via CLI-style overrides so the smoke stays cheap).

Mirrors the reference's conf tree breadth (lid/conf/xf_asr*.yaml ladder:
base joint, wav2vec joint, wavlm joint, extra-finetune variants,
supervised, cross-entropy)."""

import glob
import math
import os

import numpy as np
import pytest

from speechlid_tpu.core import load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
RECIPES = sorted(
    os.path.splitext(os.path.basename(p))[0]
    for p in glob.glob(os.path.join(CONFIG_DIR, "*.yaml"))
)

TINY_SSL = [
    "module.ssl_config.encoder_layers=1",
    "module.ssl_config.encoder_embed_dim=32",
    "module.ssl_config.encoder_ffn_embed_dim=64",
    "module.ssl_config.encoder_attention_heads=2",
]
TINY_CONFORMER = [
    "module.n_blocks=1",
    "module.encoder_dim=16",
]


def test_recipe_inventory_covers_reference_ladder():
    names = set(RECIPES)
    for expect in [
        "asr", "lid_cross", "lid_supervised", "lid_wavlm",
        "lid_wavlm_extra", "lid_wav2vec", "lid_wav2vec_extra",
        "lid_cross_wavlm", "lid_cross_wav2vec", "lid_extra_finetune",
        "sweep_lid",
    ]:
        assert expect in names, f"missing recipe {expect}"


@pytest.mark.parametrize("name", [r for r in RECIPES if r != "sweep_lid"])
def test_recipe_loads_and_builds_task(name):
    conf = load_config(CONFIG_DIR, name)
    assert conf.get("module") is not None
    task_type = conf.module.get("task")
    assert task_type in ("lid_asr", "lid_cross_entropy", "asr"), task_type

    overrides = []
    if conf.module.get("ssl_config"):
        overrides += TINY_SSL
    if conf.module.get("featurizer", "conformer") == "conformer":
        overrides += TINY_CONFORMER
    conf = load_config(CONFIG_DIR, name, overrides)

    from speechlid_tpu.cli.main_lid import build_task
    from speechlid_tpu.data import CTCTokenizer

    tok = CTCTokenizer([" ", "a", "b", "c"])
    data = {
        "lang2vocab": {"fa": 8, "sw": 9},
        "lang2index": {"fa": 0, "sw": 1},
        "tokenizers": {"fa": tok, "sw": tok},
    }
    task = build_task(conf, data)
    assert task is not None
    # hyperparameters captured for resume_from_checkpoint
    assert isinstance(task.hyper_parameters, dict)


class TestBayesSweep:
    """TPE bayes mode of the sweep driver (reference wandb bayes,
    lid/sweep.yml) on an analytic objective."""

    SPEC = {
        "method": "bayes",
        "metric": {"name": "loss", "goal": "minimize"},
        "trials": 40,
        "n_startup": 8,
        "seed": 3,
        "parameters": {
            "lr": {"distribution": "log_uniform", "min": 1e-5, "max": 1e-1},
            "width": {"distribution": "uniform", "min": -2.0, "max": 2.0},
            "act": {"values": ["relu", "gelu", "swish"]},
        },
    }

    @staticmethod
    def _objective(sample):
        # optimum: lr=1e-3, width=0.5, act=gelu
        loss = (math.log10(sample["lr"]) + 3.0) ** 2
        loss += (sample["width"] - 0.5) ** 2
        loss += 0.0 if sample["act"] == "gelu" else 1.0
        return loss

    def test_bayes_converges_and_beats_random(self, tmp_path):
        from speechlid_tpu.cli.sweep import run_sweep_spec

        res_b = run_sweep_spec(
            dict(self.SPEC), out_root=str(tmp_path / "b"),
            objective=self._objective,
        )
        best_b = res_b[0]["loss"]
        assert best_b < 0.25, f"bayes best too poor: {best_b}"

        spec_r = dict(self.SPEC)
        spec_r["method"] = "random"
        res_r = run_sweep_spec(
            spec_r, out_root=str(tmp_path / "r"), objective=self._objective
        )
        best_r = res_r[0]["loss"]
        # with the same budget, TPE should do at least as well as random
        assert best_b <= best_r + 0.25, (best_b, best_r)
        # late bayes trials concentrate near the optimum vs the warmup
        warm = [r["loss"] for r in sorted(res_b, key=lambda r: r["trial"])[:8]]
        late = [r["loss"] for r in sorted(res_b, key=lambda r: r["trial"])[-8:]]
        assert np.mean(late) < np.mean(warm)

    def test_failed_trials_survive(self, tmp_path):
        from speechlid_tpu.cli.sweep import run_sweep_spec

        calls = []

        def flaky(sample):
            calls.append(sample)
            if len(calls) % 3 == 0:
                raise RuntimeError("diverged")
            return self._objective(sample)

        spec = dict(self.SPEC)
        spec["trials"] = 12
        res = run_sweep_spec(spec, out_root=str(tmp_path / "f"),
                             objective=flaky)
        assert len(res) == 12
        assert any(r["loss"] is None for r in res)
        assert any(r["loss"] is not None for r in res)


def test_extra_recipes_mirror_reference_semantics():
    wavlm_extra = load_config(CONFIG_DIR, "lid_wavlm_extra")
    # weighted layer-sum + pitch aug + large encoder (xf_asr_wavlm_extra)
    assert wavlm_extra.module.feature_selection == "hidden_states"
    assert wavlm_extra.data.wav_augment.pitch_shift is True
    assert wavlm_extra.module.ssl_config.encoder_embed_dim == 1024

    wav2vec = load_config(CONFIG_DIR, "lid_wav2vec")
    assert wav2vec.module.featurizer == "wav2vec2"
    assert wav2vec.module.ssl_config.mask_prob == 0.15

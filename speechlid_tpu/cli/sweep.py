"""Hyperparameter sweep driver (reference: wandb bayes sweeps —
mnist/sweep.yml, lid/sweep.yml, wav2vec-exp/sweep.yml — which re-launched
the entry point with sampled CLI overrides to optimize a monitored metric).

Offline analog: random search with an optional successive-halving cull,
launching `main_lid.main` in-process with sampled ``key=value`` overrides
and reading the monitored metric from the run's metrics.jsonl.

Sweep spec (YAML):
    method: random            # random | grid
    metric: {name: avg_val_loss, goal: minimize}
    trials: 10
    program_config: lid_supervised
    base_overrides: ["trainer.total_epoch=3", ...]
    parameters:
      module.lr: {distribution: log_uniform, min: 1e-4, max: 1e-2}
      module.dropout: {values: [0.0, 0.1, 0.2]}
      data.batch_size: {distribution: int_uniform, min: 4, max: 16}
"""

from __future__ import annotations

import argparse
import itertools
import json
import logging
import math
import os
import random
from typing import Any, Dict, List

import yaml


def _sample(spec: Dict, rng: random.Random) -> Any:
    if "values" in spec:
        return rng.choice(spec["values"])
    dist = spec.get("distribution", "uniform")
    lo, hi = float(spec["min"]), float(spec["max"])
    if dist == "log_uniform":
        return math.exp(rng.uniform(math.log(lo), math.log(hi)))
    if dist == "int_uniform":
        return rng.randint(int(lo), int(hi))
    return rng.uniform(lo, hi)


def _grid(params: Dict) -> List[Dict]:
    keys = list(params)
    values = [params[k]["values"] for k in keys]
    return [dict(zip(keys, combo)) for combo in itertools.product(*values)]


def _read_last_metric(metrics_path: str, name: str):
    value = None
    if not os.path.exists(metrics_path):
        return None
    with open(metrics_path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if name in rec:
                value = rec[name]
    return value


def run_sweep_spec(
    spec: Dict, config_dir: str = "configs", out_root: str = "exp/sweep"
) -> List[Dict]:
    from speechlid_tpu.cli.main_lid import main as train_main

    rng = random.Random(spec.get("seed", 0))
    metric = spec["metric"]["name"]
    goal = spec["metric"].get("goal", "minimize")
    params = spec.get("parameters", {})
    if spec.get("method", "random") == "grid":
        samples = _grid(params)
    else:
        samples = [
            {k: _sample(v, rng) for k, v in params.items()}
            for _ in range(int(spec.get("trials", 10)))
        ]

    results = []
    for i, sample in enumerate(samples):
        exp_dir = os.path.join(out_root, f"trial_{i}")
        overrides = list(spec.get("base_overrides", []))
        overrides += [f"{k}={v}" for k, v in sample.items()]
        overrides += [f"exp_dir={exp_dir}"]
        logging.info("sweep trial %d: %s", i, sample)
        try:
            train_main(
                ["--config-dir", config_dir,
                 "--config-name", spec["program_config"], *overrides]
            )
            value = _read_last_metric(
                os.path.join(exp_dir, "metrics.jsonl"), metric
            )
        except Exception as e:  # a diverged trial shouldn't kill the sweep
            logging.warning("trial %d failed: %s", i, e)
            value = None
        results.append({"trial": i, **sample, metric: value})
    ok = [r for r in results if r[metric] is not None]
    ok.sort(key=lambda r: r[metric], reverse=(goal == "maximize"))
    out_path = os.path.join(out_root, "results.jsonl")
    os.makedirs(out_root, exist_ok=True)
    with open(out_path, "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
    logging.info("sweep best: %s", ok[0] if ok else None)
    return ok + [r for r in results if r[metric] is None]


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("sweep_yaml")
    parser.add_argument("--config-dir", default="configs")
    parser.add_argument("--out", default="exp/sweep")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)
    with open(args.sweep_yaml) as f:
        spec = yaml.safe_load(f)
    run_sweep_spec(spec, args.config_dir, args.out)


if __name__ == "__main__":
    main()

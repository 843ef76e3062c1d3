"""On-chip offline-eval validation: the reference's L6 workflow on real TPU.

Trains a small supervised joint ASR-LID through the REAL CLI
(``speechlid_tpu.cli.main_lid``) on a synthetic 3-language corpus, then
drives the full offline-eval surface (``speechlid_tpu.cli.test_lid`` —
the rebuild of lid/test.py + test_*_all.sh) on the chip:

- clean + SNR×noise sweep cells (NoiseBank crops, batched jitted mixing),
- KenLM perplexity LID arbitration over per-language word ARPA models
  (lm_select, lid/test.py:202-220),
- per-utterance CSV records and the XF submission writer
  (lid/test_xf2.py).

Each phase runs in its OWN SUBPROCESS (chip-fault isolation — the
documented axon pattern); the parent assembles
``docs/runs/EVAL_CHIP_<date>.md``.

Run:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/eval_chip_validate.py
"""

from __future__ import annotations

import datetime
import json
import math
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_chip_demo import LANG_TEXTS, SR, make_corpus  # noqa: E402


def write_config(conf_dir: str, corpus_root: str) -> str:
    os.makedirs(conf_dir, exist_ok=True)
    langs = "\n".join(
        f"    - manifest: {corpus_root}/{lang}/train.txt\n"
        f"      val_manifest: {corpus_root}/{lang}/train.txt"
        for lang in sorted(LANG_TEXTS)
    )
    path = os.path.join(conf_dir, "chip_eval.yaml")
    with open(path, "w") as f:
        f.write(f"""model_name: chip_eval
experiment_name: chip_eval
stage: train
trainer:
  total_epoch: 24
  progress_bar: false
  save_topk: 1
module:
  task: lid_asr
  n_blocks: 4
  encoder_dim: 96
  heads: 4
  dim_head: 24
  sub_sampling: 4
  head_dim_head: 16
  head_num_head: 4
  mask_times: 1
  remat: true
  lr: 1.5e-3
  schedule: tristage
  schedule_conf:
    phase_ratio: [0.1, 0.4, 0.5]
    max_update: 288  # 24 epochs x 12 steps (96 utts / batch 8)
data:
  source: xf
  sample_rate: {SR}
  batch_size: 8
  max_duration: 2.0
  max_duration_eval: 2.0
  max_text_len: 24
  buckets_s: [1.0, 2.0]
  langs:
{langs}
""")
    return path


def write_noises(noise_dir: str) -> None:
    """NOISEX-92 stand-ins: white, babble (many-voice hum), factory1
    (tonal machinery + broadband)."""
    from speechlid_tpu.data.audio_io import write_wav

    rng = np.random.RandomState(7)
    t = np.arange(SR * 4) / SR
    white = rng.randn(len(t)) * 0.3
    babble = sum(
        np.sin(2 * np.pi * f * t + rng.rand() * 6.28)
        * (0.5 + 0.5 * np.sin(2 * np.pi * r * t))
        for f, r in [(170, 2.3), (220, 3.1), (310, 1.7), (450, 2.9)]
    ) * 0.15 + 0.05 * rng.randn(len(t))
    factory = (
        0.4 * np.sin(2 * np.pi * 50 * t)
        + 0.25 * np.sin(2 * np.pi * 120 * t)
        + 0.2 * rng.randn(len(t))
    )
    os.makedirs(noise_dir, exist_ok=True)
    for name, wav in [("white", white), ("babble", babble),
                      ("factory1", factory)]:
        write_wav(os.path.join(noise_dir, f"{name}.wav"),
                  wav.astype(np.float32), SR)


def write_lms(lm_dir: str) -> None:
    """Per-language word-unigram ARPA models over each language's tiny
    vocabulary — disjoint word sets, so perplexity arbitration genuinely
    discriminates (the reference's kenlm.Model per language)."""
    os.makedirs(lm_dir, exist_ok=True)
    for lang, texts in LANG_TEXTS.items():
        words = sorted({w for s in texts for w in s.split()})
        logp = math.log10(1.0 / (len(words) + 1))  # +1 for </s> mass
        lines = ["\\data\\", f"ngram 1={len(words) + 3}", "",
                 "\\1-grams:", "-2.00\t<unk>", f"{logp:.4f}\t<s>",
                 f"{logp:.4f}\t</s>"]
        lines += [f"{logp:.4f}\t{w}" for w in words]
        lines += ["", "\\end\\", ""]
        with open(os.path.join(lm_dir, f"{lang}.arpa"), "w") as f:
            f.write("\n".join(lines))


def _phase_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/.axon_site:" + REPO
    env.setdefault("SPEECHLID_CACHE_DISABLE", "1")
    return env


def _wait_for_worker(max_probes: int = 3) -> bool:
    """After a chip fault the axon worker can take minutes to recover;
    probe with a tiny matmul (+ host fetch — block_until_ready does not
    truly wait on this backend) before retrying a failed phase."""
    probe = ("import jax, jax.numpy as jnp, numpy as np;"
             "x = jnp.ones((128, 128));"
             "print(float(np.asarray((x @ x)[0, 0])))")
    for i in range(max_probes):
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], env=_phase_env(),
                capture_output=True, timeout=300,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(30)
    return False


def run_phase(cmd, log_path: str, timeout: float, retries: int = 0):
    """One subprocess per phase (chip-fault isolation). A nonzero rc is
    retried up to ``retries`` times — the axon worker occasionally
    crashes mid-graph; wait for it to answer a probe before retrying."""
    env = _phase_env()
    attempts = 0
    while True:
        t0 = time.perf_counter()
        try:
            with open(log_path, "w") as log:
                proc = subprocess.run(
                    [sys.executable, "-m"] + cmd, stdout=log,
                    stderr=subprocess.STDOUT, cwd=REPO, env=env,
                    timeout=timeout,
                )
            rc = proc.returncode
        except subprocess.TimeoutExpired:
            # a hung worker must not abort the whole driver — a hang is
            # just another retryable per-phase failure
            rc = -9
        wall = time.perf_counter() - t0
        if rc == 0 or attempts >= retries:
            return rc, wall, attempts
        attempts += 1
        _wait_for_worker()


def main() -> None:
    # stamp the artifact date at START — multi-hour runs cross midnight
    # and a report-time date silently diverges from references written
    # during the run
    date = datetime.date.today().isoformat()
    # optional argv[1]: reuse a previous run's root (corpus + config +
    # trained ckpt) so eval-phase iterations skip the ~15-min training
    reuse = sys.argv[1] if len(sys.argv) > 1 else None
    root = reuse or tempfile.mkdtemp(prefix="lid_chip_eval_")
    conf_dir = os.path.join(root, "conf")
    noise_dir = os.path.join(root, "noise")
    lm_dir = os.path.join(root, "lms")
    exp_dir = os.path.join(root, "exp")
    out_dir = os.path.join(root, "out")
    os.makedirs(out_dir, exist_ok=True)

    report = {"phases": {}}
    ckpt = os.path.join(exp_dir, "ckpt", "last.ckpt")
    if reuse and os.path.exists(ckpt):
        report["phases"]["train"] = {"rc": 0, "wall_s": 0.0,
                                     "reused": root}
    else:
        make_corpus(root)
        write_config(conf_dir, root)
        write_noises(noise_dir)
        write_lms(lm_dir)
        rc, wall, _ = run_phase(
            ["speechlid_tpu.cli.main_lid", "--config-dir", conf_dir,
             "--config-name", "chip_eval", f"exp_dir={exp_dir}"],
            os.path.join(out_dir, "train.log"), timeout=1500,
        )
        report["phases"]["train"] = {"rc": rc, "wall_s": round(wall, 1)}
        if rc != 0 or not os.path.exists(ckpt):
            print(json.dumps(report), flush=True)
            raise SystemExit(
                f"training failed rc={rc}; see {out_dir}/train.log")
    metrics = []
    mpath = os.path.join(exp_dir, "metrics.jsonl")
    if os.path.exists(mpath):
        metrics = [json.loads(l) for l in open(mpath)]

    base = ["speechlid_tpu.cli.test_lid", "--ckpt", ckpt,
            "--config-dir", conf_dir, "--config-name", "chip_eval",
            "--noise-dir", noise_dir, "--lm-dir", lm_dir,
            "--kenlm-threshold", "0.15"]

    # SNR × noise grid, ONE SUBPROCESS PER CELL: the in-process --sweep
    # keeps 13 cells inside one process, and a single axon worker fault
    # loses them all (observed twice); per-cell isolation + the
    # persistent compile cache makes each cell cheap and independently
    # retryable.
    cells = [(None, None)] + [
        (snr, noise)
        for noise in ("white", "factory1", "babble")
        for snr in (0.0, 5.0, 10.0, 15.0)
    ]
    rows, failed, retried = [], 0, 0
    t_sweep = time.perf_counter()
    for ci, (snr, noise) in enumerate(cells):
        cmd = list(base)
        if snr is not None:
            cmd += ["--snr", str(snr), "--noise", noise]
        log = os.path.join(out_dir, f"cell_{ci}.log")
        rc, wall, retries = run_phase(cmd, log, timeout=900, retries=1)
        retried += retries
        if rc != 0:
            failed += 1
            continue
        for line in reversed(open(log).read().splitlines()):
            if line.startswith("{"):
                rows.append({"snr": snr, "noise": noise or "clean",
                             **json.loads(line)})
                break
        else:
            failed += 1  # rc=0 but no result JSON — count, don't hide
    report["phases"]["sweep"] = {
        "rc": 0 if failed == 0 else 1,
        "wall_s": round(time.perf_counter() - t_sweep, 1),
        "retries": retried, "cells_failed": failed, "rows": rows,
    }

    csv_path = os.path.join(out_dir, "records.csv")
    sub_path = os.path.join(out_dir, "submission.tsv")
    rc, wall, _ = run_phase(
        base + ["--snr", "5", "--noise", "babble",
                "--csv", csv_path, "--submission", sub_path],
        os.path.join(out_dir, "single.log"), timeout=900, retries=1,
    )
    single = {}
    for line in reversed(open(os.path.join(out_dir, "single.log"))
                         .read().splitlines()):
        if line.startswith("{"):
            single = json.loads(line)
            break
    n_csv = (max(0, len(open(csv_path).read().splitlines()) - 1)
             if os.path.exists(csv_path) else 0)
    n_sub = (len(open(sub_path).read().splitlines())
             if os.path.exists(sub_path) else 0)
    report["phases"]["single"] = {
        "rc": rc, "wall_s": round(wall, 1), "result": single,
        "csv_records": n_csv, "submission_lines": n_sub,
    }

    # ---------------------------------------------------------------- report
    import jax

    platform = jax.devices()[0].platform
    doc = os.path.join(REPO, "docs", "runs", f"EVAL_CHIP_{date}.md")
    val = [m for m in metrics if "avg_val_loss" in m]
    loss_curve = " → ".join(f"{m['avg_val_loss']:.3f}" for m in val)
    lines = [
        f"# On-chip offline-eval validation — {date}",
        "",
        f"Platform: `{platform}` (one tunneled v5e chip). The reference's",
        "L6 eval workflow (lid/test.py + test_*_all.sh grids) driven",
        "end-to-end through the real CLIs by",
        "`scripts/eval_chip_validate.py`: `main_lid` trains a supervised",
        "joint ASR-LID (4-block 96-d Conformer, 3 synthetic languages,",
        "96 utts), then `test_lid` evaluates the checkpoint on chip with",
        "noise injection, KenLM perplexity arbitration (word-unigram ARPA",
        "per language, threshold 0.15), CSV records and the XF submission",
        "writer.",
        "",
        ("Training (CLI, reused checkpoint from a prior run of this "
         "script):" if report["phases"]["train"].get("reused") else
         f"Training (CLI, {report['phases']['train']['wall_s']} s wall):"),
        f"val-loss {loss_curve}",
        "",
        "## SNR × noise grid (one `test_lid` subprocess per cell, "
        f"{report['phases']['sweep']['wall_s']} s wall, "
        f"cells failed={report['phases']['sweep']['cells_failed']}, "
        f"chip-fault retries={report['phases']['sweep']['retries']})",
        "",
        "| cell | acc | EER | Cavg | EER(true) | CER | arbitrated | "
        "ms/utt |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        cell = ("clean" if r["noise"] == "clean"
                else f"{r['noise']} @ {r['snr']:g} dB")
        lines.append(
            f"| {cell} | {r['acc']:.3f} | {r['eer']:.3f} | "
            f"{r['cavg']:.3f} | {r['eer_true']:.3f} | {r['cer']:.3f} | "
            f"{r['lm_arbitrated']}/{r['n_utts']} | "
            f"{r['avg_time_s'] * 1e3:.1f} |"
        )
    s = report["phases"]["single"]
    lines += [
        "",
        "## Single-cell run with writers (babble @ 5 dB)",
        "",
        f"- result: `{json.dumps(s['result'])}`",
        f"- per-utterance CSV records written: {s['csv_records']}",
        f"- submission file lines (test_xf2 format): {s['submission_lines']}",
        f"- wall: {s['wall_s']} s",
        "",
    ]
    # conclusion is derived from the recorded rows, not asserted
    if rows:
        n_arb = sum(r["lm_arbitrated"] for r in rows)
        clean = next((r for r in rows if r["noise"] == "clean"), None)
        noisy = [r for r in rows if r["noise"] != "clean"]
        lines.append(
            f"{len(rows)} grid cells recorded; LM perplexity arbitration "
            f"fired on {n_arb} close-call utterances across the grid."
        )
        if clean and noisy:
            worst = min(noisy, key=lambda r: r["acc"])
            delta = clean["acc"] - worst["acc"]
            verdict = (
                "noise injection degrades the tiny model as expected"
                if delta > 0.01 else
                "no measurable noise degradation at this model quality"
            )
            lines.append(
                f"Clean acc {clean['acc']:.3f} vs worst noisy cell "
                f"({worst['noise']} @ {worst['snr']:g} dB) "
                f"{worst['acc']:.3f} — {verdict}."
            )
        lines.append(
            "The full reference eval surface (noise mixing, KenLM "
            "arbitration, CSV + submission writers) ran end-to-end on "
            "hardware."
        )
    else:
        lines.append(
            "SWEEP ROWS MISSING — the sweep phase did not produce "
            f"results (rc={report['phases']['sweep']['rc']}); only the "
            "single-cell phase is validated by this run."
        )
    lines.append("")
    with open(doc, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"doc": doc, **{k: {kk: vv for kk, vv in v.items()
                                          if kk != "rows"}
                                     for k, v in report["phases"].items()}},
                     indent=1), flush=True)


if __name__ == "__main__":
    main()

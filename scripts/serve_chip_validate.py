"""On-chip serving validation: drive cli/serve.py /lid and /se end-to-end
on the axon TPU and record p50/p95 latencies (VERDICT-r2 item 8).

The reference only CONSUMED an SE service over HTTP (lid/test.py:184-197);
this rebuild PROVIDES one — prove it on hardware:

1. train a tiny supervised LID ckpt + a tiny FaSNet-TAC SE ckpt on a
   synthetic 3-language corpus (subprocess, chip);
2. launch ``python -m speechlid_tpu.cli.serve`` (subprocess, chip; SE runs
   on the CPU backend by design — tasks/se.py make_enhance_fn);
3. wait for /healthz, then fire warm sequential + concurrent requests at
   /lid and /se across duration buckets;
4. write docs/runs/SERVE_CHIP_<date>.md with the latency table.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/serve_chip_validate.py
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import socket
import subprocess
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root: speechlid_tpu
sys.path.insert(0, _HERE)  # scripts/: train_chip_demo

from train_chip_demo import build, feeder, make_corpus, make_task  # noqa: E402

SR = 16000


# ---------------------------------------------------------------------------
# phase: train the two tiny checkpoints (runs in a subprocess on the chip)
# ---------------------------------------------------------------------------

def train_ckpts(corpus_root: str, ckpt_root: str):
    from speechlid_tpu.core import Trainer
    from speechlid_tpu.core.callbacks import CkptCallback

    os.environ.setdefault("SPEECHLID_CACHE_DISABLE", "1")

    ds, toks, lang2index, lang2vocab = build(corpus_root)
    task = make_task(toks, lang2index, lang2vocab)
    lid_dir = os.path.join(ckpt_root, "lid")
    tr = Trainer(total_epoch=2, use_progress_bar=False, seed=0,
                 callbacks=[CkptCallback(lid_dir, monitor="avg_val_loss")])
    tr.fit(task, feeder(ds), feeder(ds))
    print("lid ckpt:", os.path.join(lid_dir, "last.ckpt"), flush=True)

    # tiny FaSNet-TAC SE ckpt on synthetic noisy/clean pairs
    from speechlid_tpu.tasks.se import SETask

    rng = np.random.RandomState(0)
    clean = rng.randn(16, SR).astype(np.float32) * 0.1
    noisy = clean + rng.randn(16, SR).astype(np.float32) * 0.03
    batches = [{"noisy": noisy[i : i + 4], "clean": clean[i : i + 4]}
               for i in range(0, 16, 4)]
    se_task = SETask(model_type="fasnet_tac", enc_dim=32, hidden=32,
                     n_blocks=1, chunk=50, lr=1e-3)
    se_dir = os.path.join(ckpt_root, "se")
    tr2 = Trainer(total_epoch=1, use_progress_bar=False, seed=0,
                  callbacks=[CkptCallback(se_dir, monitor="avg_val_loss")])
    tr2.fit(se_task, batches, batches)
    print("se ckpt:", os.path.join(se_dir, "last.ckpt"), flush=True)


# ---------------------------------------------------------------------------
# serve config: point the production config schema at the synthetic corpus
# ---------------------------------------------------------------------------

def write_config(corpus_root: str, conf_dir: str):
    langs = []
    for lang in sorted(os.listdir(corpus_root)):
        m = os.path.join(corpus_root, lang, "train.txt")
        if os.path.isfile(m):
            langs.append(f"    - manifest: {m}\n      val_manifest: {m}")
    os.makedirs(conf_dir, exist_ok=True)
    with open(os.path.join(conf_dir, "serve_demo.yaml"), "w") as f:
        f.write(f"""model_name: serve_demo
experiment_name: serve_demo
stage: serve
trainer:
  total_epoch: 1
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
  lr: 2.0e-3
  schedule: null
data:
  source: xf
  sample_rate: 16000
  batch_size: 4
  max_duration: 3.0
  max_duration_eval: 3.0
  max_text_len: 16
  buckets_s: [1.0, 2.0]
  langs:
{chr(10).join(langs)}
""")


# ---------------------------------------------------------------------------
# client-side measurement
# ---------------------------------------------------------------------------

def _post(url: str, body: bytes, timeout: float = 120.0):
    req = urllib.request.Request(url, data=body, method="POST")
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        payload = resp.read()
    return (time.perf_counter() - t0) * 1e3, payload


def measure(port: int, n_seq: int = 20, n_conc: int = 8):
    rng = np.random.RandomState(1)
    base = f"http://127.0.0.1:{port}"
    out = {}
    for ep, dur in [("lid", 1.0), ("lid", 2.0), ("se", 1.0)]:
        wav = (rng.randn(int(SR * dur)) * 0.05).astype(np.float32)
        lat = []
        for _ in range(n_seq):
            ms, payload = _post(f"{base}/{ep}", wav.tobytes())
            lat.append(ms)
        if ep == "lid":
            parsed = json.loads(payload)
            assert "lang" in parsed and "scores" in parsed, parsed
        else:
            got = np.frombuffer(payload, np.float32)
            assert got.shape == wav.shape and np.isfinite(got).all()
        out[f"{ep}_{dur:g}s"] = {
            "p50_ms": round(float(np.percentile(lat, 50)), 1),
            "p95_ms": round(float(np.percentile(lat, 95)), 1),
            "n": n_seq,
        }
        print(f"/{ep} {dur:g}s: p50={out[f'{ep}_{dur:g}s']['p50_ms']}ms",
              flush=True)

    # concurrent burst at /lid (thread-per-request server; device funnel)
    wav = (rng.randn(SR) * 0.05).astype(np.float32).tobytes()
    lat, errs = [], []

    def one():
        try:
            ms, _ = _post(f"{base}/lid", wav)
            lat.append(ms)
        except Exception as e:  # noqa: BLE001
            errs.append(str(e))

    threads = [threading.Thread(target=one) for _ in range(n_conc)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = (time.perf_counter() - t0) * 1e3
    assert not errs, errs
    out["lid_concurrent8"] = {
        "p50_ms": round(float(np.percentile(lat, 50)), 1),
        "p95_ms": round(float(np.percentile(lat, 95)), 1),
        "burst_wall_ms": round(wall, 1),
        "n": n_conc,
    }
    return out


def orchestrate():
    corpus_root = tempfile.mkdtemp(prefix="serve_demo_corpus_")
    ckpt_root = tempfile.mkdtemp(prefix="serve_demo_ckpt_")
    conf_dir = tempfile.mkdtemp(prefix="serve_demo_conf_")
    make_corpus(corpus_root)
    write_config(corpus_root, conf_dir)

    rc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--phase", "train",
         "--corpus", corpus_root, "--ckpt-root", ckpt_root],
        timeout=2400,
    ).returncode
    if rc != 0:
        raise SystemExit(f"train phase failed rc={rc}")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server = subprocess.Popen(
        [sys.executable, "-m", "speechlid_tpu.cli.serve",
         "--ckpt", os.path.join(ckpt_root, "lid", "last.ckpt"),
         "--se-ckpt", os.path.join(ckpt_root, "se", "last.ckpt"),
         "--config-dir", conf_dir, "--config-name", "serve_demo",
         "--port", str(port), "--buckets", "1,2"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        deadline = time.monotonic() + 1800  # warmup compiles on the chip
        while True:
            if server.poll() is not None:
                raise SystemExit(f"server died rc={server.returncode}")
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=5
                ) as r:
                    if r.status == 200:
                        break
            except Exception:  # noqa: BLE001
                pass
            if time.monotonic() > deadline:
                raise SystemExit("server never became healthy")
            time.sleep(5)
        results = measure(port)
    finally:
        server.terminate()
        try:
            server.wait(timeout=30)
        except subprocess.TimeoutExpired:
            # stuck in a tunneled device call: don't lose the measured
            # results (or leave a zombie holding the single-job chip)
            server.kill()
            server.wait(timeout=10)

    import jax  # platform for the report only

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    date = datetime.date.today().isoformat()
    out = f"docs/runs/SERVE_{'CHIP' if on_tpu else 'CPU'}_{date}.md"
    os.makedirs("docs/runs", exist_ok=True)
    rows = "\n".join(
        f"| {k} | {v['p50_ms']} | {v['p95_ms']} | {v['n']} |"
        for k, v in results.items()
    )
    with open(out, "w") as f:
        where = ("the axon TPU" if on_tpu
                 else "the CPU backend (chip unavailable — harness proof)")
        f.write(f"""# {'On-chip' if on_tpu else 'CPU-backend'} serving validation — {date}

`cli/serve.py` driven end-to-end on {where}
(platform `{platform}`): tiny supervised Conformer LID +
FaSNet-TAC SE checkpoints trained on the same backend, served over HTTP with bucket
warmup ({{1,2}} s), then measured with warm sequential requests and an
8-way concurrent burst.  SE executes on the CPU backend by design
(tasks/se.py make_enhance_fn — scan-heavy dual-path graph, mirrors the
reference's SE-as-a-separate-service deployment, lid/test.py:184-197).

Reproduce: `PYTHONPATH=/root/.axon_site:/root/repo python scripts/serve_chip_validate.py`

| endpoint/bucket | p50 ms | p95 ms | n |
|---|---|---|---|
{rows}

Concurrent burst wall: {results['lid_concurrent8']['burst_wall_ms']} ms for
8 parallel /lid requests (device work serialized through the main-thread
funnel — cli/serve.py _DeviceLoop).
""")
    print("report:", out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default=None)
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--ckpt-root", default=None)
    args = ap.parse_args()
    if args.phase == "train":
        train_ckpts(args.corpus, args.ckpt_root)
    else:
        orchestrate()


if __name__ == "__main__":
    main()

"""HTTP inference server: LID scoring and speech enhancement.

The reference *consumed* a closed-source SE model over HTTP at eval time
(lid/test.py:184-197 POSTs a wav to localhost:8080/se and blends the
result).  This serves both directions TPU-native:

- ``POST /lid``  raw float32 PCM body (16 kHz) → JSON {lang, scores}
- ``POST /se``   raw float32 PCM body → enhanced float32 PCM body
- ``GET  /healthz`` → {"status": "ok"}
- ``GET  /stats``  → per-phase latency percentiles (pad/queue/device/total)
  for the gap attribution VERDICT r3 weak-#6 asked for: on the tunneled
  remote-execution TPU every host→device upload and device→host fetch is
  its own ~25 ms round-trip, so the served path's floor is
  uploads + execute + fetch, not the raw-infer execute + fetch.

Single-chip serving: requests are padded to the nearest duration bucket so
the jitted graphs are reused (no per-length recompiles); a lock serializes
device work (stdlib http.server, thread-per-request).

Usage:
    python -m speechlid_tpu.cli.serve --ckpt exp/.../last.ckpt \
        --config-dir configs --config-name lid_supervised --port 8080
"""

from __future__ import annotations

import argparse
import functools
import json
import logging
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np

BUCKETS_S = (1.0, 2.0, 3.0, 4.0, 8.0, 13.0, 17.0)
# 3.0 is the reference's eval crop duration (lid/test.py max_duration=3.0):
# without it a 3 s utterance pads to the 4 s bucket and pays 33 % extra
# MXU time on every request.


class _DeviceLoop:
    """All jax work funnels through the MAIN thread.

    On the axon remote-compile TPU stack, device work issued from any
    thread other than the one that initialized jax crashes the TPU worker
    process.  So the http server runs on a daemon thread and request
    handlers marshal jobs here; the main thread sits in :meth:`run`
    executing them (it is also the thread that restored the checkpoint and
    runs warmup)."""

    def __init__(self):
        import queue

        self._q: "queue.Queue" = queue.Queue()
        self._started = False

    def run_forever(self):
        self._started = True
        while True:
            fn, args, out = self._q.get()
            try:
                out["result"] = fn(*args)
            except Exception as e:  # noqa: BLE001 — relayed to caller
                out["error"] = e
            out["event"].set()

    def call(self, fn, *args):
        if not self._started and threading.current_thread() is threading.main_thread():
            # warmup phase on the main thread — execute inline
            return fn(*args)
        if not self._started:
            # a request can land in the window between the HTTP server
            # starting and run_forever() flipping _started — running jax
            # inline HERE (a handler thread) would crash the TPU worker;
            # wait briefly for the loop (tests that never start a loop
            # still fall through to inline after the grace period)
            deadline = time.monotonic() + 5.0
            while not self._started and time.monotonic() < deadline:
                time.sleep(0.01)
            if not self._started:
                return fn(*args)
        out = {"event": threading.Event()}
        self._q.put((fn, args, out))
        out["event"].wait()
        if "error" in out:
            raise out["error"]
        return out["result"]


class InferenceState:
    def __init__(self, lid_fn=None, se_fn=None, index2lang=None,
                 sample_rate=16000, lid_packed_fn=None):
        self._device = _DeviceLoop()
        self.lid_fn = lid_fn
        # packed-IO variant: one (1, T+1) upload carrying wave + length
        # instead of two host→device transfers per request — on the
        # tunneled remote-execution backend each transfer is its own
        # ~25 ms round-trip, so folding the tiny lengths array into the
        # wave upload removes a full RTT from the serve floor
        self.lid_packed_fn = lid_packed_fn
        self.se_fn = se_fn
        self.index2lang = index2lang or {}
        self.sample_rate = sample_rate
        self.lock = threading.Lock()
        # per-phase latency samples (seconds) for /stats gap attribution
        import collections

        self._stats = {
            k: collections.deque(maxlen=2048)
            for k in ("pad", "queue", "device", "total")
        }
        self._bucket_hits = collections.Counter()
        self._stats_lock = threading.Lock()

    def _record(self, **phases: float) -> None:
        with self._stats_lock:
            for k, v in phases.items():
                self._stats[k].append(v)

    def stats_summary(self) -> Dict:
        """Per-phase p50/p95 over the last ≤2048 /lid requests.

        pad    — host-side numpy padding + dither
        queue  — handler→device-loop handoff + lock wait
        device — upload(s) + jitted execute + score fetch (the tunnel part)
        total  — request wall inside the handler (excl. HTTP read/write)
        """
        import numpy as _np

        with self._stats_lock:
            out = {}
            for k, d in self._stats.items():
                if not d:
                    continue
                a = _np.asarray(d) * 1e3
                out[k] = {
                    "p50_ms": round(float(_np.percentile(a, 50)), 2),
                    "p95_ms": round(float(_np.percentile(a, 95)), 2),
                    "n": int(a.size),
                }
            out["bucket_hits"] = {
                f"{t / self.sample_rate:g}s": c
                for t, c in sorted(self._bucket_hits.items())
            }
            out["packed_io"] = self.lid_packed_fn is not None
            return out

    def warmup(self) -> None:
        """Compile every bucket's graph up front (no cold-start latency) and
        BLOCK on the results.

        Warmup input is low-level noise, not zeros: executing this graph on
        all-zero audio faults the axon TPU kernel asynchronously, poisoning
        the worker so the *next* request fails — found via a long bisect.
        The same guard is applied to served audio (see :meth:`lid`).
        """
        rng = np.random.RandomState(0)
        for b in BUCKETS_S:
            t = int(b * self.sample_rate)
            wav = rng.randn(t).astype(np.float32) * 1e-3
            if self.lid_fn is not None:
                self.lid(wav)  # materializes scores → blocks on the graph
            if self.se_fn is not None:
                self.enhance(wav)
            logging.info("warmed %.1fs bucket", b)
        # warmup requests pay compiles — they would dominate the /stats
        # percentiles until real traffic outnumbers them; start clean
        with self._stats_lock:
            for d in self._stats.values():
                d.clear()
            self._bucket_hits.clear()

    def _bucket(self, n: int) -> int:
        for b in BUCKETS_S:
            t = int(b * self.sample_rate)
            if n <= t:
                return t
        return int(BUCKETS_S[-1] * self.sample_rate)

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def _guard_noise(t: int) -> np.ndarray:
        """Per-bucket anti-degenerate dither (cached: it was already a
        fixed rng(0) draw per request, so caching is behavior-identical
        and drops ~t host normals off every request)."""
        return (1e-6 * np.random.default_rng(0)
                .standard_normal((1, t))).astype(np.float32)

    def lid(self, wav: np.ndarray) -> Dict:
        t_req = time.perf_counter()
        t = self._bucket(len(wav))
        n = min(len(wav), t)
        packed = self.lid_packed_fn is not None
        padded = np.zeros((1, t + 1 if packed else t), np.float32)
        padded[0, :n] = wav[:n]
        # anti-degenerate guard: constant/silent audio faults the axon TPU
        # kernel; -120 dB dither is inaudible and keeps stats well-defined
        padded[0, :t] += self._guard_noise(t)[0]
        if packed:
            # fold the length into the wave upload: one transfer, one RTT.
            # float32 is exact for ints < 2^24; t ≤ 272k samples.
            padded[0, t] = n
        t_pad = time.perf_counter()

        def job():
            import jax.numpy as jnp

            t_dev = time.perf_counter()
            if packed:
                scores = self.lid_packed_fn(jnp.asarray(padded))
            else:
                scores = self.lid_fn(jnp.asarray(padded), jnp.asarray([n]))
            # ONE host fetch of the (1, L) scores; pred is argmax(scores)
            # by definition (models/multilang.py infer), computed host-side
            return np.asarray(scores, np.float32), t_dev

        with self.lock:
            scores_all, t_dev = self._device.call(job)
        t_done = time.perf_counter()
        self._record(pad=t_pad - t_req, queue=t_dev - t_pad,
                     device=t_done - t_dev, total=t_done - t_req)
        with self._stats_lock:
            self._bucket_hits[t] += 1
        scores = scores_all[0]
        pred = int(np.argmax(scores))
        return {
            "lang": self.index2lang.get(pred, str(pred)),
            "scores": {
                self.index2lang.get(i, str(i)): float(s)
                for i, s in enumerate(scores)
            },
        }

    def enhance(self, wav: np.ndarray) -> np.ndarray:
        t = self._bucket(len(wav))
        padded = np.zeros(t, np.float32)
        padded[: min(len(wav), t)] = wav[:t]
        # same anti-degenerate guard as lid(): a silent request must not
        # hand the axon kernel constant audio (async fault poisons the
        # worker for every later request)
        padded += (1e-6 * np.random.default_rng(0).standard_normal(
            padded.shape)).astype(np.float32)
        with self.lock:
            out = self._device.call(
                lambda: np.asarray(self.se_fn(padded), np.float32)
            )
        return out[: len(wav)]


def make_handler(state: InferenceState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logging.info("%s " + fmt, self.client_address[0], *args)

        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n)

        def _send(self, code: int, payload: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, b'{"status": "ok"}', "application/json")
            elif self.path == "/stats":
                self._send(
                    200, json.dumps(state.stats_summary()).encode(),
                    "application/json",
                )
            else:
                self._send(404, b'{"error": "not found"}', "application/json")

        def do_POST(self):
            try:
                raw = self._body()
                if len(raw) % 4 != 0 or not raw:
                    self._send(
                        400,
                        b'{"error": "body must be non-empty float32 PCM"}',
                        "application/json",
                    )
                    return
                wav = np.frombuffer(raw, np.float32)
                if self.path == "/lid" and state.lid_fn is not None:
                    result = state.lid(wav)
                    self._send(
                        200, json.dumps(result).encode(), "application/json"
                    )
                elif self.path == "/se" and state.se_fn is not None:
                    out = state.enhance(wav)
                    self._send(200, out.tobytes(), "application/octet-stream")
                else:
                    self._send(
                        404, b'{"error": "unknown endpoint"}',
                        "application/json",
                    )
            except Exception as e:  # noqa: BLE001 — serve errors as 500s
                logging.exception("request failed")
                self._send(
                    500, json.dumps({"error": str(e)}).encode(),
                    "application/json",
                )

    return Handler


def http_enhance_client(url: str):
    """Client matching the reference's eval-time SE usage
    (lid/test.py:184-197): wav (T,) → enhanced wav (T,), usable as the
    evaluator's ``enhance_fn``."""
    import urllib.request

    def enhance(wav: np.ndarray) -> np.ndarray:
        req = urllib.request.Request(
            url, data=np.asarray(wav, np.float32).tobytes(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            return np.frombuffer(resp.read(), np.float32)

    return enhance


def build_lid_fn(args):
    import jax

    from flax import serialization

    from speechlid_tpu.cli.main_lid import build_data, build_feeder
    from speechlid_tpu.core import load_config
    from speechlid_tpu.core.checkpoint import load_checkpoint
    from speechlid_tpu.tasks import LidASRTask

    conf = load_config(args.config_dir, args.config_name, args.overrides)
    data = build_data(conf)
    payload = load_checkpoint(args.ckpt)
    hparams = dict(payload["meta"].get("hyper_parameters", {}))
    module_conf = conf.module.to_dict()
    module_conf.pop("task", None)
    hparams.update(module_conf)
    if getattr(args, "quant", None):
        # int8 serving: same checkpoint, quantized dense projections
        hparams["quant_dot"] = args.quant
        hparams.setdefault("ssl_conv_impl", "matmul")
    task = LidASRTask(tokenizers=data["tokenizers"], **hparams)
    feeder = build_feeder(conf, data["val_dataset"] or data["dataset"],
                          train=False)
    sample = next(iter(feeder))
    variables = task.init_variables(jax.random.PRNGKey(0), sample)
    params = serialization.from_state_dict(
        variables["params"], payload["state"]["params"]
    )
    restored = dict(variables)
    restored["params"] = params
    # serve-path graph returns ONLY the (B, L) score matrix: pred_lang is
    # argmax(scores) (models/multilang.py infer), so it is recomputed on
    # the host from the one fetched array.  On the remote-execution TPU
    # path every graph output and every host fetch is a tunnel round-trip
    # (~25 ms each); the full infer dict (incl. the (L, B, T, V) logits)
    # as graph outputs + two fetches was most of the 3x serve-vs-raw p50
    # gap (docs/runs/SERVE_CHIP_2026-08-18.md).
    base_infer = task.infer_fn()
    infer = jax.jit(lambda v, w, l: base_infer(v, w, l)["scores"])

    # packed-IO graph: the request's (1, T) wave and its length arrive as
    # ONE (1, T+1) float32 upload (length in the trailing slot — exact for
    # ints < 2^24) so a /lid request pays a single host→device round-trip
    # instead of two on the tunneled remote-execution backend.
    def _packed(v, p):
        import jax.numpy as jnp

        return base_infer(v, p[:, :-1], p[:, -1].astype(jnp.int32))["scores"]

    infer_packed = jax.jit(_packed)
    index2lang = task.index2lang
    return ((lambda w, l: infer(restored, w, l)),
            (lambda p: infer_packed(restored, p)), index2lang)


def build_se_fn(se_ckpt: str):
    """Restore an SE checkpoint (any SETask model_type) into a
    per-utterance (T,)→(T,) enhance hook."""
    import jax
    import jax.numpy as jnp

    from flax import serialization

    from speechlid_tpu.core.checkpoint import load_checkpoint
    from speechlid_tpu.tasks.se import SETask

    payload = load_checkpoint(se_ckpt)
    task = SETask(**payload["meta"].get("hyper_parameters", {}))
    # init through the task contract: it owns model-specific input
    # shaping (e.g. FaSNet-TAC consumes (B, nmic, T), not (B, T))
    v = task.init_variables(
        jax.random.PRNGKey(0), {"noisy": jnp.zeros((1, 16000))}
    )
    params = serialization.from_state_dict(
        v["params"], payload["state"]["params"]
    )
    return task.make_enhance_fn({"params": params})


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", default=None, help="LID checkpoint")
    parser.add_argument("--se-ckpt", default=None, help="SE checkpoint")
    parser.add_argument("--config-dir", default="configs")
    parser.add_argument("--config-name", default=None)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--quant", default=None, choices=("int8",),
                        help="serve the LID model with dynamic int8 dense "
                             "projections (ops/quant.py; same checkpoint)")
    parser.add_argument("--buckets", default=None,
                        help="comma-separated bucket durations in seconds "
                             "(default: 1,2,4,8,13,17)")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    from speechlid_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO, force=True)

    lid_fn = lid_packed_fn = index2lang = None
    if args.ckpt:
        lid_fn, lid_packed_fn, index2lang = build_lid_fn(args)
        if os.environ.get("SPEECHLID_SERVE_UNPACKED_IO"):
            # A/B escape hatch: serve with the two-upload (wave, lengths)
            # graphs instead of the packed single-upload path
            lid_packed_fn = None

    se_fn = build_se_fn(args.se_ckpt) if args.se_ckpt else None

    global BUCKETS_S
    if args.buckets:
        BUCKETS_S = tuple(float(b) for b in args.buckets.split(","))
    state = InferenceState(lid_fn, se_fn, index2lang,
                           lid_packed_fn=lid_packed_fn)
    logging.info("warming up bucket graphs (%s)...", BUCKETS_S)
    state.warmup()
    server = ThreadingHTTPServer((args.host, args.port), make_handler(state))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    logging.info("serving on %s:%d (lid=%s se=%s)", args.host, args.port,
                 bool(lid_fn), bool(se_fn))
    # main thread becomes the device-execution loop (axon single-thread rule)
    state._device.run_forever()


if __name__ == "__main__":
    main()

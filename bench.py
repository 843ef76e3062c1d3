"""Benchmark: 3 s-clip LID inference throughput per chip on the FLAGSHIP.

Driver-facing: prints ONE JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}`` —
UNCONDITIONALLY.  The orchestrator is deadline-proof:

- the chip-free CPU reference (vs_baseline denominator) is a cached
  host constant after its first measurement, and when it does need
  measuring it runs CONCURRENTLY with the device stages — it never
  spends device budget; the headline WavLM f32 batch sweep (b128 point
  first — the measured knee) leads on the chip, with the flagship
  training step immediately after it;
- a global wall-clock budget (env ``SPEECHLID_BENCH_BUDGET_S``, default
  500 s) is enforced between stages and caps every child's timeout, so the
  parent always finishes before a ``timeout 600`` driver kill;
- ``atexit`` + SIGTERM/SIGINT handlers emit the final JSON with whatever
  stages completed, so even a driver kill records partials;
- every stage subprocess enables the persistent XLA compile cache
  (``speechlid_tpu.core.compile_cache``, runtime dir under ``~/.cache``)
  — reruns skip the multi-minute tunneled compiles; nothing is pre-baked
  into the repo, so a fresh container pays honest cold compiles and
  relies on incremental in-stage emission to land partial results;
- the full-bf16 WavLM stage (a documented worker hang —
  docs/runs/CHIP_FINDINGS_r2.md) only runs with
  ``SPEECHLID_BENCH_FULL_BF16=1``.

Headline metric (BASELINE.json): utterances/sec/chip on 3 s clips through
the WavLM joint LID model — WavLM-Base+ 12×768 encoder with gated relative
position bias feeding 3 per-language ConformerLinear heads + the language
discriminator, i.e. the reference's full ``LidModule.infer`` with
``lang=None`` (lid/WavLMMutiLangModel.py:224-257, lid/wavlm/WavLM.py:161).
A batch sweep ({32, 128} × {f32, bf16-mixed}) probes the MXU-bound knee;
``value`` is the best point.

Honesty notes:
- Methodology: DISTINCT host-generated inputs per iteration and a
  ``block_until_ready`` after EVERY step — the tunneled bench device dedups
  repeated identical computations, so anything weaker measures a cache.
- ``mfu`` = analytic matmul FLOPs/utt × utt/s ÷ assumed chip peak
  (v5e: 197 TFLOPS bf16; f32 ≈ 99 TFLOPS assumed half rate).  A calibration
  GEMM is reported so inflated-environment numbers are visible: this
  tunneled device has measured far above physical v5e peak on raw matmuls,
  so treat absolute utt/s as environment-specific and MFU/calibration as
  the cross-check.
- ``vs_baseline`` is accel-vs-this-host-CPU running the SAME compiled
  graph (the reference's torch stack cannot run in this image; measured,
  not copied — BASELINE.md).
"""

from __future__ import annotations

import atexit
import json
import os
import signal
import sys
import time

import numpy as np

V5E_PEAK_TFLOPS = {"bf16": 197.0, "f32": 99.0, "int8": 394.0}  # assumed

BUDGET_S = float(os.environ.get("SPEECHLID_BENCH_BUDGET_S", "500"))
_T0 = time.monotonic()


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


# ---------------------------------------------------------------------------
# analytic FLOPs (matmul terms only — standard MFU accounting)
# ---------------------------------------------------------------------------


def wavlm_flagship_flops_per_utt(t_samples: int = 48000, n_lang: int = 3):
    """Forward-pass matmul FLOPs for one 3 s utterance through the
    WavLM-Base+ joint model (conv extractor + 12-layer encoder + 3
    ConformerLinear heads + discriminator)."""
    fl = 0.0
    # conv extractor: [(512,10,5)] + [(512,3,2)]*4 + [(512,2,2)]*2
    t = t_samples
    cin = 1
    for (c, k, s) in [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2:
        t = (t - k) // s + 1
        fl += 2.0 * cin * c * k * t
        cin = c
    tp = t  # encoder frames (≈149 for 3 s)
    d, ffn = 768, 3072
    fl += 2.0 * 512 * d * tp  # post_extract_proj
    fl += 2.0 * (d // 16) * d * 128 * tp  # grouped conv positional embedding
    per_layer = (
        4 * 2.0 * d * d * tp  # q/k/v/out projections
        + 2 * 2.0 * d * tp * tp  # qk^T and att·v
        + 2 * 2.0 * d * ffn * tp  # fc1 + fc2
    )
    fl += 12 * per_layer
    # 3 ConformerLinear heads: 1 ConformerBlock(dim=768, ff_mult=4,
    # conv_expansion=2, dim_head=32, num_head=8) + Dense(V+1)
    inner = 32 * 8
    block = (
        2 * 2.0 * d * (4 * d) * tp * 2  # two ½-FFNs (768→3072→768 each)
        + 2.0 * d * inner * tp  # to_q
        + 2.0 * d * 2 * inner * tp  # to_kv
        + 2 * 2.0 * inner * tp * tp  # scores + weighted sum
        + 2.0 * inner * d * tp  # to_out
        + 2.0 * d * (2 * 2 * d) * tp  # conv module pointwise-in (GLU)
        + 2.0 * 31 * 2 * d * tp  # depthwise conv k=31
        + 2.0 * (2 * d) * d * tp  # conv module pointwise-out
    )
    vmax = 96
    fl += n_lang * (block + 2.0 * d * (vmax + 1) * tp)
    return fl


def conformer_flagship_flops_per_utt(t_samples: int = 48000, n_lang: int = 3):
    """Matmul FLOPs for the small Conformer joint model (14×144-d encoder,
    4× subsample) — the secondary metric."""
    frames = 1 + t_samples // 160
    tp = ((frames - 1) // 2 - 1) // 2  # 4× conv2d subsample
    d, inner = 144, 64 * 4
    fl = 2.0 * (80 // 4) * d * 9 * tp * 8  # rough conv2d subsample stack
    per_block = (
        2 * 2.0 * d * (4 * d) * tp * 2
        + 2.0 * d * inner * tp + 2.0 * d * 2 * inner * tp
        + 2 * 2.0 * inner * tp * tp + 2.0 * inner * d * tp
        + 2.0 * d * (2 * 2 * d) * tp + 2.0 * 31 * 2 * d * tp
        + 2.0 * (2 * d) * d * tp
    )
    fl += 14 * per_block
    head_inner = 32 * 8
    head_block = (
        2 * 2.0 * d * (4 * d) * tp * 2
        + 2.0 * d * head_inner * tp + 2.0 * d * 2 * head_inner * tp
        + 2 * 2.0 * head_inner * tp * tp + 2.0 * head_inner * d * tp
        + 2.0 * d * (2 * 2 * d) * tp + 2.0 * 31 * 2 * d * tp
        + 2.0 * (2 * d) * d * tp
    )
    fl += n_lang * (head_block + 2.0 * d * 97 * tp)
    return fl


# ---------------------------------------------------------------------------
# measurement
# ---------------------------------------------------------------------------


def _device(kind: str):
    import jax

    try:
        devs = jax.devices(kind)
    except RuntimeError:
        devs = [d for d in jax.devices() if d.platform == kind]
    return devs[0] if devs else None


def _sync(out):
    """True device sync: fetch one output leaf to the HOST.

    ``jax.block_until_ready`` does NOT reliably wait on the tunneled axon
    backend — a chained-GEMM probe "finished" in 0.5 ms what takes 226 ms
    at physical peak.  In-order device execution means materializing any
    leaf of the LAST output proves everything before it completed."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[:1] if getattr(leaf, "ndim", 0) else leaf)


def _throughput(fn, make_input, batch: int, iters: int) -> float:
    """utt/s with distinct inputs per iteration; host-materialized sync."""
    _sync(fn(make_input(0)))  # compile + warm
    inputs = [make_input(i + 1) for i in range(iters)]
    # settle the H2D transfers with a HOST FETCH of the last input —
    # block_until_ready can resolve early on this backend (see _sync), and
    # in-order execution means the last transfer landing implies them all;
    # otherwise hundreds of MB of tunnel transfer bill into the window
    _sync(inputs[-1])
    t0 = time.perf_counter()
    out = None
    for w in inputs:
        out = fn(w)
    _sync(out)
    return batch * iters / (time.perf_counter() - t0)


def bench_model(model_fn, device, dtype_name: str, batch: int, iters: int):
    """→ (utt/s, mfu) for a flagship builder on one device — the
    single-point form of :func:`bench_model_sweep` (one code path: the
    CPU-init trick, params-as-jit-args 413 workaround and MFU math live
    only there)."""
    out = bench_model_sweep(
        model_fn, device, dtype_name, batches=(batch,), iters=iters
    )
    pt = out["sweep"][str(batch)]
    return pt["utt_s"], pt["mfu"]


def bench_model_sweep(model_fn, device, dtype_name: str, batches, iters: int):
    """Batch sweep in ONE process: init + 376 MB param transfer happen once
    and are amortized over every batch point (per-child startup dominated
    round-2 bench variance on the tunneled chip).  Prints a CUMULATIVE
    ``{"sweep": ...}`` JSON line after every point so a parent timeout
    still lands the points measured so far."""
    import jax
    import jax.numpy as jnp

    from speechlid_tpu.models.multilang import MutiLangModel

    model, flops_utt = model_fn(dtype_name)
    t = 48000
    rng = np.random.RandomState(0)
    cpu = _device("cpu")
    key = jax.random.PRNGKey(0)
    with jax.default_device(cpu):
        variables = model.init(
            {"params": key, "dropout": key, "stochastic_depth": key},
            jnp.zeros((1, 4000), jnp.float32) + 1e-3,
            jnp.full((1,), 4000, jnp.int32),
            method=MutiLangModel.infer,
        )
    peak_key = "bf16" if dtype_name.startswith("bf16") else dtype_name
    peak = V5E_PEAK_TFLOPS.get(peak_key, V5E_PEAK_TFLOPS["f32"]) * 1e12
    out = {}
    with jax.default_device(device):
        variables = jax.device_put(variables, device)
        for batch in batches:
            lengths = jnp.full((batch,), t, jnp.int32)

            @jax.jit
            def infer(variables, wavs, lengths=lengths):
                o = model.apply(
                    variables, wavs, lengths, method=MutiLangModel.infer
                )
                return o["scores"], o["pred_lang"]

            def make_input(i, batch=batch):
                return jnp.asarray(
                    rng.randn(batch, t).astype(np.float32) * 0.1
                )

            utt_s = _throughput(lambda w: infer(variables, w), make_input,
                                batch, iters)
            out[str(batch)] = {
                "utt_s": round(utt_s, 1),
                "mfu": round(flops_utt * utt_s / peak, 4),
            }
            print(json.dumps({"sweep": out}), flush=True)
    return {"sweep": out}


def _wavlm_builder(dtype_name: str):
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_wavlm

    # scan-over-layers flagship variant: identical numerics, O(1)-in-depth
    # compiles (models/wavlm.py scan_layers) — opt-in for A/B on the chip;
    # SPEECHLID_BENCH_SCAN_UNROLL probes the fusion/compile-size middle
    # ground (docs/runs/scan_ab_probe.py findings)
    scan = bool(os.environ.get("SPEECHLID_BENCH_SCAN"))
    scan_unroll = int(os.environ.get("SPEECHLID_BENCH_SCAN_UNROLL", "1"))
    # conv-extractor lowering A/B: framed-matmul vs lax conv (exact-parity
    # tests/test_quant.py); unset → 'conv' for exact dtypes, 'matmul' for
    # int8 (the framed GEMM is what rides the int8 MXU path)
    conv_impl = os.environ.get("SPEECHLID_BENCH_CONV_IMPL") or None
    if dtype_name == "bf16mix":
        # bf16 encoder + f32 heads: the stable mixed config on this chip
        # (bf16 Conformer-head fusions hang — docs/runs/CHIP_FINDINGS_r2.md)
        model = _flagship_wavlm(
            n_lang=3, dtype=jnp.bfloat16, head_dtype=jnp.float32,
            scan_layers=scan, scan_unroll=scan_unroll,
            conv_impl=conv_impl,
        )
    elif dtype_name == "int8":
        # dynamic W8A8 serving path: int8 dense projections (MXU 2× rate),
        # bf16 elementwise/conv, f32 norm/softmax islands (ops/quant.py).
        # Approximate numerics — reported SEPARATELY from the headline.
        model = _flagship_wavlm(
            n_lang=3, dtype=jnp.bfloat16, scan_layers=scan,
            scan_unroll=scan_unroll, quant_dot="int8",
            conv_impl=conv_impl or "matmul",
        )
    else:
        dt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
        model = _flagship_wavlm(n_lang=3, dtype=dt, scan_layers=scan,
                                scan_unroll=scan_unroll,
                                conv_impl=conv_impl)
    return model, wavlm_flagship_flops_per_utt()


def bench_conformer(device, batch: int, iters: int):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from speechlid_tpu.models.multilang import MutiLangModel
    from speechlid_tpu.ops.frontend import frame_lengths, normalize_wav, wav2mel

    model = _flagship(n_lang=3)
    t = 48000
    rng = np.random.RandomState(0)
    with jax.default_device(device):
        lengths = jnp.full((batch,), t, jnp.int32)
        key = jax.random.PRNGKey(0)
        w0 = jnp.asarray(rng.randn(batch, t).astype(np.float32) * 0.1)
        mel0 = jnp.transpose(
            wav2mel(normalize_wav(w0, lengths), lengths=lengths), (0, 2, 1)
        )
        f_len = frame_lengths(lengths, 160)
        variables = model.init(
            {"params": key, "dropout": key, "stochastic_depth": key},
            mel0, f_len, method=MutiLangModel.infer,
        )

        @jax.jit
        def infer(variables, wavs):  # variables as arg: see bench_model
            mel = jnp.transpose(
                wav2mel(normalize_wav(wavs, lengths), lengths=lengths),
                (0, 2, 1),
            )
            out = model.apply(
                variables, mel, frame_lengths(lengths, 160),
                method=MutiLangModel.infer,
            )
            return out["scores"], out["pred_lang"]

        def make_input(i):
            return jnp.asarray(rng.randn(batch, t).astype(np.float32) * 0.1)

        utt_s = _throughput(lambda w: infer(variables, w), make_input,
                            batch, iters)
    flops = conformer_flagship_flops_per_utt()
    mfu = flops * utt_s / (V5E_PEAK_TFLOPS["f32"] * 1e12)
    return utt_s, mfu


def calibration_gemm(device, dtype_name: str, n: int = 4096, chain: int = 64):
    """Measured TFLOPS on a chain of n×n×n matmuls inside ONE jit —
    exposes how far this environment sits from physical v5e peak.

    The chain matters: on the tunneled axon backend each dispatch costs
    ~25 ms round-trip, so per-call matmuls measure dispatch latency, not
    GEMM rate (round-2 calib read 5.3 TF while the WavLM graph sustained
    ~49 TF).  A data-dependent scan amortizes one dispatch over `chain`
    matmuls; inputs are generated on-device (no 64 MB tunnel transfers)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    if dtype_name == "int8":
        # s8×s8→s32 MXU rate; requantize the carry back to int8 per step
        # (n² VPU work against n³ MXU work — negligible at n=4096)
        @jax.jit
        def run(key):
            a = jax.random.randint(key, (n, n), -127, 128, jnp.int32)
            b = jax.random.randint(
                jax.random.fold_in(key, 1), (n, n), -127, 128, jnp.int32
            ).astype(jnp.int8)

            def body(c, _):
                o = lax.dot_general(
                    c, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                c = jnp.clip(o // (127 * 64), -127, 127).astype(jnp.int8)
                return c, ()

            out, _ = lax.scan(body, a.astype(jnp.int8), None, length=chain)
            return out.sum()
    else:
        dt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32

        @jax.jit
        def run(key):
            a = jax.random.normal(key, (n, n), jnp.float32).astype(dt)
            b = (jax.random.normal(jax.random.fold_in(key, 1), (n, n),
                                   jnp.float32) / np.sqrt(n)).astype(dt)

            def body(c, _):
                return (c @ b).astype(dt), ()

            out, _ = lax.scan(body, a, None, length=chain)
            return out.sum()

    with jax.default_device(device):
        _sync(run(jax.random.PRNGKey(0)))  # compile + warm
        times = []
        for i in range(4):
            # _sync (host fetch), NOT block_until_ready: the async scalar
            # future resolves before the device finishes on this backend
            # (measured 41 PF of phantom throughput)
            t0 = time.perf_counter()
            _sync(run(jax.random.PRNGKey(i + 1)))
            times.append(time.perf_counter() - t0)
        dt_s = float(np.median(times))
    return chain * 2.0 * n**3 / dt_s / 1e12


def frontend_rtf(device):
    """Frontend RTF (batched, production Pallas path on TPU).

    Its own stage (round-3 lesson: pairing it with the b1 flagship p50
    graph in one child meant a p50 compile overrun lost the ALREADY
    MEASURED RTF — BENCH_r03 recorded null after burning 154.9 s)."""
    import jax
    import jax.numpy as jnp

    from speechlid_tpu.ops.frontend import fused_frontend, resolve_method

    rng = np.random.RandomState(0)
    with jax.default_device(device):
        lengths = jnp.full((32,), 48000, jnp.int32)
        fe = jax.jit(lambda w: fused_frontend(w, lengths)[0])

        def make_input(i):
            return jnp.asarray(rng.randn(32, 48000).astype(np.float32) * 0.1)

        sps = _throughput(fe, make_input, 32, 20)  # utt/s
        rtf = 1.0 / (sps * 3.0)
    return round(float(rtf), 8), resolve_method("auto")


def p50_latency(device):
    """p50 single-utterance end-to-end WavLM LID latency (b1 graph)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_wavlm
    from speechlid_tpu.models.multilang import MutiLangModel

    rng = np.random.RandomState(0)
    model = _flagship_wavlm(n_lang=3)
    key = jax.random.PRNGKey(0)
    cpu = _device("cpu")
    with jax.default_device(cpu):  # cheap CPU init (see bench_model)
        variables = model.init(
            {"params": key, "dropout": key},
            jnp.zeros((1, 4000), jnp.float32) + 1e-3,
            jnp.full((1,), 4000, jnp.int32),
            method=MutiLangModel.infer,
        )
    with jax.default_device(device):
        l1 = jnp.asarray([48000], jnp.int32)
        w1 = jnp.asarray(rng.randn(1, 48000).astype(np.float32) * 0.1)
        variables = jax.device_put(variables, device)

        @jax.jit
        def infer_one(variables, w):  # variables as arg: see bench_model
            return model.apply(
                variables, w, l1, method=MutiLangModel.infer
            )["pred_lang"]

        _sync(infer_one(variables, w1))
        lat = []
        for i in range(20):
            w = jnp.asarray(rng.randn(1, 48000).astype(np.float32) * 0.1)
            jax.block_until_ready(w)
            t0 = time.perf_counter()
            _sync(infer_one(variables, w))  # host fetch = true latency
            lat.append(time.perf_counter() - t0)
        p50 = float(np.median(lat) * 1e3)
    return round(p50, 3)


def bench_train_step(device, dtype_name: str = "bf16", batch: int = 64,
                     iters: int = 8):
    """Flagship TRAINING-step throughput: WavLM-Base+ joint LID fine-tune
    step (fwd + bwd + Adam update, donated state) — the reference's hot
    loop (ccml/trainer.py:497-573) at flagship scale.  bf16 b64 is the
    measured-best config (docs/runs/TRAIN_CHIP_2026-08-18.md).

    MFU uses 3x forward matmul FLOPs (fwd + 2x-cost bwd) against the
    dtype's assumed peak."""
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship_wavlm
    from speechlid_tpu.ops.ctc import ctc_loss

    T, S = 48000, 24
    dt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    model = _flagship_wavlm(n_lang=3, dtype=dt)
    rng = np.random.RandomState(0)
    cpu = _device("cpu")
    tx = optax.adam(1e-4)
    with jax.default_device(cpu):  # shape-independent init off-device
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((2, 4000), jnp.float32) + 1e-3,
            jnp.full((2,), 4000, jnp.int32),
            deterministic=False,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = jax.jit(tx.init, backend="cpu")(params)

    params = jax.device_put(params, device)
    batch_stats = jax.device_put(batch_stats, device)
    opt_state = jax.device_put(opt_state, device)
    with jax.default_device(device):
        lengths = jnp.full((batch,), T, jnp.int32)
        text_lengths = jnp.full((batch,), S, jnp.int32)

        def loss_fn(params, batch_stats, wavs, texts, langs, key):
            (logits, feat_lens), mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                wavs, lengths, deterministic=False,
                rngs={"dropout": key}, mutable=["batch_stats"],
            )
            own = jnp.take_along_axis(
                logits, langs[None, :, None, None], axis=0)[0]
            lp = jax.nn.log_softmax(own.astype(jnp.float32), axis=-1)
            loss = ctc_loss(lp, texts, feat_lens, text_lengths, blank=-1)
            return loss, mut["batch_stats"]

        def train_step(params, opt_state, batch_stats, wavs, texts, langs,
                       key):
            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats, wavs, texts, langs, key)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, new_bs, loss

        step = jax.jit(train_step, donate_argnums=(0, 1, 2))

        def make_batch(i):
            r = np.random.RandomState(i)
            return (
                jnp.asarray(r.randn(batch, T).astype(np.float32) * 0.1),
                jnp.asarray(r.randint(0, 39, (batch, S)).astype(np.int32)),
                jnp.asarray(r.randint(0, 3, (batch,)).astype(np.int32)),
            )

        key = jax.random.PRNGKey(42)
        wavs, texts, langs = make_batch(0)
        params, opt_state, batch_stats, loss = step(
            params, opt_state, batch_stats, wavs, texts, langs, key)
        l0 = float(loss)  # host fetch = sync (compile + first step)
        print(json.dumps({"train_first_loss": round(l0, 3)}), flush=True)

        batches = [make_batch(i + 1) for i in range(iters)]
        _sync(batches[-1])
        t0 = time.perf_counter()
        for wavs, texts, langs in batches:
            params, opt_state, batch_stats, loss = step(
                params, opt_state, batch_stats, wavs, texts, langs, key)
        l_last = float(loss)  # host fetch closes the timed window
        dt_s = (time.perf_counter() - t0) / iters
    utt_s = batch / dt_s
    peak_key = "bf16" if dtype_name == "bf16" else "f32"
    mfu = (3.0 * wavlm_flagship_flops_per_utt() * utt_s
           / (V5E_PEAK_TFLOPS[peak_key] * 1e12))
    return {
        "train_utt_s": round(utt_s, 1),
        "train_mfu": round(mfu, 4),
        # round-3 docs quoted train MFU against the f32 99 TF peak (53 %
        # at 320 utt/s); this field counts against the config's own dtype
        # peak, so bf16 reads lower for the same utt/s — same measurement
        "train_mfu_basis": f"3x fwd FLOPs vs {peak_key} "
                           f"{V5E_PEAK_TFLOPS[peak_key]:.0f} TF assumed",
        "train_step_ms": round(dt_s * 1e3, 1),
        "train_config": f"wavlm {dtype_name} b{batch} fwd+bwd+adam donated",
        "train_last_loss": round(l_last, 3),
    }


# ---------------------------------------------------------------------------
# orchestration: every measurement runs in an ISOLATED SUBPROCESS
# ---------------------------------------------------------------------------
#
# The axon worker can fault on specific fused graphs (bf16 especially —
# verify SKILL.md); a fault inside one in-process measurement used to poison
# every later one.  The parent below never touches the device: it launches
# ``bench.py --stage <name>`` children (each prints one JSON line), probes
# chip recovery after any failure, skips the known-hang full-bf16 stage,
# and ALWAYS emits the final JSON before the driver's deadline.


def _accel():
    import jax

    platforms = {d.platform for d in jax.devices()}
    kind = next((p for p in ("tpu", "axon", "gpu") if p in platforms), "cpu")
    return _device(kind)


def run_stage(stage: str) -> dict:
    from speechlid_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()  # reruns skip the multi-minute compiles
    if stage == "probe":
        import jax
        import jax.numpy as jnp

        x = jnp.ones((64, 64), jnp.float32)
        _sync(x @ x)  # host fetch — block_until_ready can lie (see _sync)
        return {"ok": True}
    if stage.startswith("wavlm_"):
        # wavlm_<dtype>[_b<batch>|_sweep], e.g. wavlm_f32_b128
        rest = stage.split("_", 1)[1]
        if rest.endswith("_sweep"):
            rest = rest[: -len("_sweep")]
            # best-known point FIRST so a parent timeout still records the
            # headline from the cumulative partial lines (b128 measured
            # 1113.9 utt/s vs ~1010 at b256 — CHIP_FINDINGS_r3.md).  Two
            # points per dtype: r4's three-point f32 sweep burned 260 s
            # before the train stage ever ran (VERDICT r4 weak #1); the
            # knee (128) + the small-batch point (32) carry the signal
            batches = (128, 32)
            return bench_model_sweep(
                _wavlm_builder, _accel(), rest, batches=batches, iters=8,
            )
        batch = 32
        if "_b" in rest:
            rest, bs = rest.rsplit("_b", 1)
            batch = int(bs)
        utt_s, mfu = bench_model(
            _wavlm_builder, _accel(), rest, batch=batch, iters=8
        )
        return {"utt_s": round(utt_s, 1), "mfu": round(mfu, 4)}
    if stage == "cpu_ref":
        import jax

        jax.config.update("jax_platforms", "cpu")
        utt_s, _ = bench_model(_wavlm_builder, _device("cpu"), "f32",
                               batch=4, iters=4)
        return {"cpu_utt_s": round(utt_s, 2)}
    if stage == "conformer":
        utt_s, mfu = bench_conformer(_accel(), batch=128, iters=8)
        return {"conformer_utt_s": round(utt_s, 1),
                "conformer_mfu": round(mfu, 4)}
    if stage in ("calib_f32", "calib_bf16", "calib_int8"):
        dtype_name = stage.split("_")[1]
        return {"tflops": round(calibration_gemm(_accel(), dtype_name), 1)}
    if stage == "frontend":
        rtf, kind = frontend_rtf(_accel())
        return {"rtf": rtf, "frontend": kind}
    if stage == "p50":
        return {"p50": p50_latency(_accel())}
    if stage == "train" or stage.startswith("train_"):
        # train[_<dtype>][_b<batch>], default bf16 b64 (measured best)
        rest = stage.split("_", 1)[1] if "_" in stage else "bf16_b64"
        dtype_name, _, bs = rest.partition("_b")
        return bench_train_step(
            _accel(), dtype_name or "bf16", int(bs or 64))
    raise SystemExit(f"unknown stage {stage}")


_CURRENT_CHILD = None  # Popen of the in-flight stage, for signal cleanup


def _run_child(stage: str, timeout_s: float):
    """→ (payload dict | None, error str | None)."""
    import subprocess

    global _CURRENT_CHILD
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--stage", stage],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    _CURRENT_CHILD = proc
    timed_out = False
    try:
        stdout, stderr = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        timed_out = True
        proc.kill()
        # sweep children print cumulative partial JSON per point — salvage
        # whatever landed on the pipe before the kill
        stdout, stderr = proc.communicate()
    finally:
        _CURRENT_CHILD = None
    for line in reversed((stdout or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                payload = json.loads(line)
            except json.JSONDecodeError:
                continue
            if timed_out:
                return payload, "timeout (partial)"
            if proc.returncode != 0:
                # the child printed cumulative points then DIED (device
                # fault mid-sweep): salvage the points but surface the
                # fault so the orchestrator re-probes before the next
                # device stage
                return payload, f"rc={proc.returncode} (partial)"
            return payload, None
    if timed_out:
        return None, "timeout"
    err = [
        ln for ln in (stderr or "").strip().splitlines()
        if ln.strip() and "WARNING" not in ln
    ]
    return None, (" | ".join(err[-4:])[:400] if err else f"rc={proc.returncode}")


# ---- always-emit machinery -------------------------------------------------

_RESULTS: dict = {}
_TIMINGS: dict = {}
_EMITTED = False


def _emit():
    """Print the final JSON from whatever stages completed.  Idempotent;
    wired to atexit AND SIGTERM/SIGINT so a driver kill still records."""
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    results = _RESULTS
    sweep = {}
    names = {"f32": "f32", "bf16mix": "bf16_mixed", "bf16": "bf16",
             "int8": "int8"}
    for stage, payload in results.items():
        if not stage.startswith("wavlm_") or not payload:
            continue
        rest = stage.split("_", 1)[1]
        if rest.endswith("_sweep"):
            name = names[rest[: -len("_sweep")]]
            for batch, pt in (payload.get("sweep") or {}).items():
                if "utt_s" in pt:
                    sweep.setdefault(name, {})[batch] = pt
            continue
        if "utt_s" not in payload:
            continue
        batch = "32"
        if "_b" in rest:
            rest, batch = rest.rsplit("_b", 1)
        sweep.setdefault(names[rest], {})[batch] = payload
    best = None
    int8_best = None
    for name, pts in sweep.items():
        for p in pts.values():
            if name == "int8":
                # approximate numerics (dynamic W8A8): reported separately,
                # NEVER the headline — the headline stays exact-dtype
                if int8_best is None or p["utt_s"] > int8_best["utt_s"]:
                    int8_best = p
                continue
            if best is None or p["utt_s"] > best["utt_s"]:
                best = p
    cpu_utt_s = (results.get("cpu_ref") or {}).get("cpu_utt_s")
    fe = results.get("frontend") or {}
    p50_res = results.get("p50") or {}
    train = results.get("train") or {}
    conf = results.get("conformer") or {}
    if best is not None:
        metric = ("3s-clip LID utterances/sec/chip "
                  "(WavLM-Base+ joint infer, all heads)")
        value = best["utt_s"]
    elif "conformer_utt_s" in conf:
        # fallback so a number still lands if every WavLM stage failed
        metric = ("3s-clip LID utterances/sec/chip "
                  "(Conformer joint infer, all heads — WavLM stages failed)")
        value = conf["conformer_utt_s"]
    else:
        metric = ("3s-clip LID utterances/sec/chip "
                  "(WavLM-Base+ joint infer, all heads)")
        value = None
    out = {
        "metric": metric,
        "value": value,
        "unit": "utt/s/chip",
        "vs_baseline": (
            round(value / cpu_utt_s, 2) if value and cpu_utt_s else None
        ),
        "batch_sweep": sweep,
        "best_mfu": best["mfu"] if best else None,
        "int8_best_utt_s": int8_best["utt_s"] if int8_best else None,
        "flops_per_utt_gflop": round(wavlm_flagship_flops_per_utt() / 1e9, 2),
        "chip_peak_tflops_assumed": V5E_PEAK_TFLOPS,
        "calibration_gemm_tflops": {
            "f32": (results.get("calib_f32") or {}).get("tflops"),
            "bf16": (results.get("calib_bf16") or {}).get("tflops"),
            "int8": (results.get("calib_int8") or {}).get("tflops"),
        },
        "cpu_reference_utt_s": cpu_utt_s,
        "conformer_utt_s": conf.get("conformer_utt_s"),
        "feature_extraction_rtf": fe.get("rtf"),
        "frontend": fe.get("frontend"),
        "p50_latency_ms_single_utt": p50_res.get("p50"),
        "train_utt_s": train.get("train_utt_s"),
        "train_mfu": train.get("train_mfu"),
        "train_mfu_basis": train.get("train_mfu_basis"),
        "train_config": train.get("train_config"),
        "errors": {
            k: v["error"] for k, v in results.items()
            if isinstance(v, dict) and "error" in v
        },
        "stage_timings_s": _TIMINGS,
        "budget_s": BUDGET_S,
        "elapsed_s": round(time.monotonic() - _T0, 1),
    }
    print(json.dumps(out), flush=True)


def _on_signal(signum, frame):
    child = _CURRENT_CHILD
    if child is not None:
        try:
            child.kill()
        except Exception:
            pass
    _emit()
    os._exit(0)


_CPU_REF_CACHE = os.path.expanduser(
    "~/.cache/speechlid_tpu/bench_cpu_ref.json"
)


def _start_cpu_ref():
    """vs_baseline denominator, handled OFF the budget path (round-4
    verdict: re-measuring this chip-free ~1.1 utt/s constant burned 77 s
    of a 500 s budget every run).  Cached once measured (it is a property
    of this host's CPU, not of the chip), else launched as a CONCURRENT
    child — it needs no accelerator, so it overlaps the device stages.

    → (cached payload | None, Popen | None)."""
    import subprocess

    try:
        with open(_CPU_REF_CACHE) as f:
            payload = json.load(f)
        if payload.get("cpu_utt_s"):
            return dict(payload, cached=True), None
    except (OSError, ValueError):
        pass
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--stage", "cpu_ref"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    return None, proc


def _finish_cpu_ref(proc) -> dict:
    try:
        stdout, _ = proc.communicate(timeout=max(5.0, _remaining() - 10.0))
    except Exception:
        proc.kill()
        return {"error": "cpu_ref timeout"}
    for line in reversed((stdout or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                payload = json.loads(line)
            except json.JSONDecodeError:
                continue
            if payload.get("cpu_utt_s"):
                try:
                    os.makedirs(os.path.dirname(_CPU_REF_CACHE),
                                exist_ok=True)
                    with open(_CPU_REF_CACHE, "w") as f:
                        json.dump(payload, f)
                except OSError:
                    pass
            return payload
    return {"error": f"cpu_ref rc={proc.returncode}"}


def main() -> None:
    atexit.register(_emit)
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    cpu_ref_payload, cpu_ref_proc = _start_cpu_ref()
    if cpu_ref_payload is not None:
        _RESULTS["cpu_ref"] = cpu_ref_payload

    # (stage, per-stage cap seconds, needs accelerator) — value-determining
    # stages first so the headline lands even under a tight driver deadline
    # Caps are sized so every NAMED metric (headline, rtf, p50, conformer,
    # ≥1 calibration, train) fits the 500 s budget on a warm compile cache
    # (the realistic driver condition: the runtime cache at
    # ~/.cache/speechlid_tpu persists across runs in one container).  On a
    # truly cold cache the cumulative per-measurement JSON each child
    # prints still lands whatever finished before its cap (round-3 lesson:
    # one 450 s sweep cap + an all-or-nothing frontend child starved 5
    # named fields — BENCH_r03.json).
    stages = [
        # batch sweeps run ALL points in one child: the 376 MB param
        # transfer + startup amortize, and cumulative partial JSON means
        # even a timeout records the points measured so far (b128 — the
        # measured knee — goes first inside the sweep)
        # Cap sized from a MEASURED truly-cold run (2026-08-19, no cache
        # seed — removed per advisor): the b128 flagship remote-compile
        # alone is ~200-210 s, so 260 s lets a stone-cold driver run still
        # land the headline point via the child's cumulative emission
        # (a 200 s cap was a near-miss: compile finished, kill beat the
        # first JSON line)
        ("wavlm_f32_sweep", 260.0, True),  # HEADLINE — first on device
        # flagship TRAINING step (fwd+bwd+adam donated, bf16 b64 — the
        # measured-best config): the reference's hot loop
        # (ccml/trainer.py:497-573).  SECOND, directly after the headline
        # (round-4 verdict: ordering it behind conformer + calibration
        # starved it of budget every cold run)
        ("train", 220.0, True),
        ("frontend", 80.0, True),  # named metric: feature_extraction_rtf
        ("p50", 120.0, True),  # named metric: p50 (own stage, r3 lesson)
        ("calib_f32", 80.0, True),  # ≥1 calibration entry (MFU denominator
        #                             health check — before conformer)
        ("conformer", 120.0, True),  # named metric: conformer_utt_s
        # FULL bf16 (encoder + heads): the round-2 hang was fixed by the
        # conv_barrier/Pallas depthwise work and confirmed on chip
        # 2026-08-18 (1117 utt/s b128) — it supersedes the bf16-mixed
        # workaround as the default bf16 stage
        ("wavlm_bf16_sweep", 200.0, True),
        ("calib_bf16", 80.0, True),
        ("calib_int8", 80.0, True),
        # dynamic-int8 serving path LAST: measured SLOWER than f32 on this
        # worker (915 vs 1118 utt/s — the 1.35x int8 GEMM ceiling doesn't
        # cover the per-dot dynamic-quantize VPU work; CHIP_FINDINGS_r3.md),
        # so it's supporting data, never the headline (_emit reports it as
        # int8_best_utt_s + its own sweep)
        ("wavlm_int8_sweep", 200.0, True),
    ]
    if os.environ.get("SPEECHLID_BENCH_BF16_MIXED"):
        # the bf16-encoder/f32-head config that worked around the (now
        # fixed) full-bf16 hang — kept measurable on demand
        stages.append(("wavlm_bf16mix_sweep", 450.0, True))

    # per-stage caps are sized for the 500 s driver budget; a generous
    # warming run (SPEECHLID_BENCH_BUDGET_S=2400) scales them up so a cap
    # kill never lands mid-remote-compile (that wedges the worker for
    # 5-15 min — docs/runs/BENCH_COLD_r4.md)
    cap_scale = max(1.0, BUDGET_S / 500.0)
    stages = [(s, c * cap_scale, a) for (s, c, a) in stages]

    # None = unknown: the FIRST device stage is preceded by a cheap probe —
    # a wedged worker (recovery can hang 5-15 min) must not eat the
    # headline stage's whole cap before we know it's down
    healthy = None
    for stage, cap, needs_accel in stages:
        rem = _remaining()
        if rem < 45.0:
            _RESULTS[stage] = {"error": "budget exhausted"}
            continue
        if needs_accel and healthy is not True:
            # ONE patient probe, not a kill-retry loop.  Measured
            # 2026-08-20: a wedged worker recovered in ~103 s *inside a
            # single connection attempt*, while the old loop's 150 s-cap
            # kills re-wedged it every cycle (killing a client
            # mid-handshake restarts the 5-15 min recovery clock —
            # BENCH_COLD_r4.md), turning one wedge into a whole-budget
            # outage (BENCH r5 dry run: 470 s of failed probes).
            payload, _ = _run_child(
                "probe", min(400.0, _remaining() - 30.0)
            )
            healthy = bool(payload and payload.get("ok"))
            if not healthy:
                # the patient attempt failed: the worker is down for
                # longer than this budget can absorb — fail the remaining
                # device stages fast instead of churning more kills
                for s2, _c2, na2 in stages:
                    if na2 and s2 not in _RESULTS:
                        _RESULTS[s2] = {"error": "chip unavailable"}
                break
        t0 = time.monotonic()
        payload, err = _run_child(stage, min(cap, _remaining() - 15.0))
        _TIMINGS[stage] = round(time.monotonic() - t0, 1)
        if payload is None:
            _RESULTS[stage] = {"error": err}
            if needs_accel:
                healthy = False  # device stage died: assume fault
        else:
            if err:  # partial sweep salvaged from a killed/dead child
                payload = dict(payload, partial=err)
                if needs_accel and not err.startswith("timeout"):
                    healthy = False  # child DIED mid-sweep: device fault
                # a cap-expiry kill ("timeout (partial)") means points
                # were landing on a healthy chip — no re-probe needed
            _RESULTS[stage] = payload
    if cpu_ref_proc is not None:
        t0 = time.monotonic()
        _RESULTS["cpu_ref"] = _finish_cpu_ref(cpu_ref_proc)
        _TIMINGS["cpu_ref_join"] = round(time.monotonic() - t0, 1)
    _emit()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default=None)
    args = ap.parse_args()
    if args.stage:
        print(json.dumps(run_stage(args.stage)))
    else:
        main()

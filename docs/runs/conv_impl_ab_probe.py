"""A/B the conv feature extractor lowering on chip: 'conv' (lax conv)
vs 'matmul' (_FramedConv im2col GEMM) in f32 and bf16.

The extractor is 28 % of flagship inference at only ~58 TF sustained
(docs/runs/CHIP_FINDINGS_r3.md decomposition) while the MXU GEMM
calibration hits 103.5 TF — if XLA's conv lowering is the gap, the
framed GEMM form (built for the int8 path) should close it for exact
dtypes too and become the TPU default.

    PYTHONPATH=/root/.axon_site:/root/repo timeout 900 \
        python docs/runs/conv_impl_ab_probe.py [batch]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from speechlid_tpu.models.wavlm import (  # noqa: E402
    ConvFeatureExtractor,
    WavLMConfig,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
T = 48000
ITERS = 8
print("backend:", jax.default_backend(), "batch:", BATCH, flush=True)

rng = np.random.RandomState(0)
cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]

base = WavLMConfig()
with jax.default_device(cpu):
    params = ConvFeatureExtractor(config=base).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4000), jnp.float32) + 1e-3
    )
params = jax.device_put(params, dev)

# FLOPs per utterance (fwd, 3 s @ 16 kHz)
t_out = T
flops = 0.0
for dim_in, (dim, k, s) in zip(
        [1] + [d for d, _, _ in base.conv_layers[:-1]], base.conv_layers):
    t_out = (t_out - k) // s + 1
    flops += 2.0 * t_out * dim * dim_in * k

results = {}
for dtype_name, dtype, peak in (
    ("f32", jnp.float32, 99.0),
    ("bf16", jnp.bfloat16, 197.0),
):
    for impl in ("conv", "matmul"):
        cfg = WavLMConfig(dtype=dtype, conv_extractor_impl=impl)
        mod = ConvFeatureExtractor(config=cfg)
        jitted = jax.jit(lambda v, w, m=mod: m.apply(v, w))
        w0 = jax.device_put(
            jnp.asarray(rng.randn(BATCH, T).astype(np.float32) * 0.1), dev)
        t0 = time.perf_counter()
        out = jitted(params, w0)
        _ = np.asarray(out.ravel()[:1])  # honest host-fetch sync
        compile_s = time.perf_counter() - t0
        inputs = [jax.device_put(
            jnp.asarray(rng.randn(BATCH, T).astype(np.float32) * 0.1), dev)
            for _ in range(ITERS)]
        for w in inputs:
            jax.block_until_ready(w)
        t0 = time.perf_counter()
        for w in inputs:
            out = jitted(params, w)
        _ = np.asarray(out.ravel()[:1])
        dt = (time.perf_counter() - t0) / ITERS
        tf = flops * BATCH / dt / 1e12
        key = f"{dtype_name}.{impl}"
        results[key] = dt
        print(f"{key}: compile {compile_s:.1f}s, {dt*1e3:.2f} ms, "
              f"{tf:.1f} TF ({tf/peak*100:.0f} % of {dtype_name} peak)",
              flush=True)

# numerical check: the two lowerings share the param tree — outputs must
# match to dtype tolerance
w = jax.device_put(
    jnp.asarray(rng.randn(4, 16000).astype(np.float32) * 0.1), dev)
o_conv = ConvFeatureExtractor(config=base).apply(params, w)
o_mm = ConvFeatureExtractor(
    config=WavLMConfig(conv_extractor_impl="matmul")).apply(params, w)
err = float(jnp.max(jnp.abs(o_conv - o_mm)))
print(f"f32 conv-vs-matmul max |err|: {err:.2e}", flush=True)
for d in ("f32", "bf16"):
    r = results[f"{d}.conv"] / results[f"{d}.matmul"]
    print(f"{d}: matmul is {r:.2f}x vs conv", flush=True)

"""Scan-over-layers runtime probe: close or explain the round-3 3x gap.

Round 3 measured scan_layers=True compiling 2.1x faster but running 3x
slower than the unrolled build (docs/runs/scan_ab_probe.py).  Hypothesis:
XLA cannot fuse across lax.scan iterations, so every layer boundary pays
materialization the unrolled build elides.  lax.scan's `unroll=k` puts k
body copies inside each loop iteration — restoring intra-group fusion
while keeping the HLO ~k/(N-1) of the unrolled build.

Arms (WavLM-Base+ joint infer, f32 b128, the headline graph):
  unrolled (baseline) | scan u1 | scan u2 | scan u4 | scan u11 (full)

Run per arm in its own subprocess (axon fault isolation):
    for a in base u1 u2 u4 u11; do
      PYTHONPATH=/root/.axon_site:/root/repo timeout 1200 \
        python docs/runs/scan_unroll_probe.py $a; done
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import _flagship_wavlm  # noqa: E402
from speechlid_tpu.models.multilang import MutiLangModel  # noqa: E402

arm = sys.argv[1]
BATCH, T, ITERS = 128, 48000, 8
scan = arm != "base"
unroll = {"base": 1, "u1": 1, "u2": 2, "u4": 4, "u11": 11}[arm]
print("backend:", jax.default_backend(), "arm:", arm, flush=True)

model = _flagship_wavlm(n_lang=3, scan_layers=scan, scan_unroll=unroll)
rng = np.random.RandomState(0)
cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
key = jax.random.PRNGKey(0)
with jax.default_device(cpu):
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((1, 4000), jnp.float32) + 1e-3,
        jnp.full((1,), 4000, jnp.int32), method=MutiLangModel.infer)
variables = jax.device_put(variables, dev)

with jax.default_device(dev):
    lengths = jnp.full((BATCH,), T, jnp.int32)

    @jax.jit
    def infer(variables, wavs):
        o = model.apply(variables, wavs, lengths,
                        method=MutiLangModel.infer)
        return o["scores"], o["pred_lang"]

    def make_input(i):
        return jnp.asarray(rng.randn(BATCH, T).astype(np.float32) * 0.1)

    t0 = time.perf_counter()
    out = infer(variables, make_input(0))
    np.asarray(out[0][:1])  # host fetch = true sync on this backend
    compile_s = time.perf_counter() - t0

    inputs = [make_input(i + 1) for i in range(ITERS)]
    np.asarray(inputs[-1][:1])
    t0 = time.perf_counter()
    for w in inputs:
        out = infer(variables, w)
    np.asarray(out[0][:1])
    dt = time.perf_counter() - t0

print(f"{arm}: compile+first {compile_s:.1f}s, "
      f"{BATCH * ITERS / dt:.1f} utt/s", flush=True)

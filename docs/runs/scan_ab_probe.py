"""Runbook step 7: scan_layers compile-time A/B on the real chip.

Arm = one subprocess, persistent compile cache DISABLED, so each arm
pays a true cold compile through the remote-compile path (where WavLM
b32 f32 historically cost ~8-9 min; models/wavlm.py scan_layers traces
ONE encoder layer instead of 12, shrinking the serialized HLO).

    for arm in baseline scan; do
      SPEECHLID_NO_COMPILE_CACHE=1 PYTHONPATH=/root/.axon_site:/root/repo \
        timeout 1200 python docs/runs/scan_ab_probe.py $arm; echo "$arm rc=$?";
    done

Reports: compile wall (lower→compile), steady utt/s (expect neutral),
serialized-HLO size (the HTTP-413 risk metric).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

arm = sys.argv[1]
BATCH, T = 32, 48000

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import _flagship_wavlm  # noqa: E402
from speechlid_tpu.models.multilang import MutiLangModel  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
model = _flagship_wavlm(n_lang=3, scan_layers=(arm == "scan"))

rng = np.random.RandomState(0)
cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
with jax.default_device(cpu):
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 4000), jnp.float32) + 1e-3,
        jnp.full((1,), 4000, jnp.int32),
        method=MutiLangModel.infer,
    )
variables = jax.device_put(variables, dev)
lengths = jax.device_put(jnp.full((BATCH,), T, jnp.int32), dev)


def infer(variables, wavs):
    return model.apply(variables, wavs, lengths,
                       method=MutiLangModel.infer)["scores"]


w0 = jax.device_put(
    jnp.asarray(rng.randn(BATCH, T).astype(np.float32) * 0.1), dev)

t0 = time.perf_counter()
lowered = jax.jit(infer).lower(variables, w0)
t_lower = time.perf_counter() - t0
hlo_bytes = len(lowered.compiler_ir("hlo").as_serialized_hlo_module_proto())
t0 = time.perf_counter()
compiled = lowered.compile()
t_compile = time.perf_counter() - t0
print(f"{arm}: lower {t_lower:.1f}s, serialized-HLO {hlo_bytes/1e6:.1f} MB, "
      f"compile {t_compile:.1f}s", flush=True)

# steady throughput, honest host-fetch sync at the window end
out = compiled(variables, w0)
_ = np.asarray(jax.tree_util.tree_leaves(out)[0][:1])  # warm + sync
iters = 8
inputs = [jax.device_put(
    jnp.asarray(rng.randn(BATCH, T).astype(np.float32) * 0.1), dev)
    for _ in range(iters)]
t0 = time.perf_counter()
for w in inputs:
    out = compiled(variables, w)
_ = np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
dt = time.perf_counter() - t0
print(f"{arm}: steady {BATCH * iters / dt:.1f} utt/s (b{BATCH}, "
      f"{iters} iters)", flush=True)

"""Flagship TRAINING-step throughput on chip: WavLM-Base+ joint LID
fine-tune step (fwd + bwd + Adam update, donated state), f32 and bf16.

The inference story is benched (bench.py); this measures the training
path at flagship scale — the graph class the framework exists for.
Each arm runs in its own subprocess (axon robustness pattern):

    for arm in f32_b32 bf16_b32 f32_b64 bf16_b64; do
      PYTHONPATH=/root/.axon_site:/root/repo timeout 1200 \
        python docs/runs/train_step_probe.py $arm; echo "$arm rc=$?";
    done

MFU uses 3x forward FLOPs (fwd + 2x-cost bwd), vs the f32 99 TF assumed
peak — compare against the measured ~103.5 TF worker ceiling.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from __graft_entry__ import _flagship_wavlm  # noqa: E402
from speechlid_tpu.ops.ctc import ctc_loss  # noqa: E402

arm = sys.argv[1]
dtype_name, b = arm.split("_b")
BATCH = int(b)
T, S, ITERS = 48000, 24, 8
DT = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
print("backend:", jax.default_backend(), "arm:", arm, flush=True)

model = _flagship_wavlm(n_lang=3, dtype=DT)
rng = np.random.RandomState(0)
cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]

with jax.default_device(cpu):
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, 4000), jnp.float32) + 1e-3,
        jnp.full((2,), 4000, jnp.int32),
        deterministic=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(1e-4)
    opt_state = jax.jit(tx.init, backend="cpu")(params)
n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
print(f"params: {n_params/1e6:.1f} M", flush=True)

params = jax.device_put(params, dev)
batch_stats = jax.device_put(batch_stats, dev)
opt_state = jax.device_put(opt_state, dev)
lengths = jax.device_put(jnp.full((BATCH,), T, jnp.int32), dev)
text_lengths = jax.device_put(jnp.full((BATCH,), S, jnp.int32), dev)


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


def train_step(params, opt_state, batch_stats, wavs, texts, langs, key):
    (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch_stats, wavs, texts, langs, key)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, new_bs, loss


step = jax.jit(train_step, donate_argnums=(0, 1, 2))


def make_batch(i):
    r = np.random.RandomState(i)
    wavs = jnp.asarray(r.randn(BATCH, T).astype(np.float32) * 0.1)
    texts = jnp.asarray(r.randint(0, 39, size=(BATCH, S), dtype=np.int64)
                        .astype(np.int32))
    langs = jnp.asarray(r.randint(0, 3, size=(BATCH,), dtype=np.int64)
                        .astype(np.int32))
    return (jax.device_put(wavs, dev), jax.device_put(texts, dev),
            jax.device_put(langs, dev))


key = jax.device_put(jax.random.PRNGKey(42), dev)
wavs, texts, langs = make_batch(0)
t0 = time.perf_counter()
params, opt_state, batch_stats, loss = step(
    params, opt_state, batch_stats, wavs, texts, langs, key)
l0 = float(loss)  # host fetch = sync
print(f"compile+first {time.perf_counter() - t0:.1f}s, loss {l0:.3f}",
      flush=True)

batches = [make_batch(i + 1) for i in range(ITERS)]
for bt in batches:
    jax.block_until_ready(bt)
t0 = time.perf_counter()
for wavs, texts, langs in batches:
    params, opt_state, batch_stats, loss = step(
        params, opt_state, batch_stats, wavs, texts, langs, key)
l_last = float(loss)  # host fetch closes the timed window
dt = (time.perf_counter() - t0) / ITERS
utt_s = BATCH / dt
fwd_flops_per_utt = 54.85e9  # bench.py wavlm_flagship_flops_per_utt
mfu = 3.0 * fwd_flops_per_utt * utt_s / (99.0e12)
print(f"{arm}: {dt * 1e3:.1f} ms/step, {utt_s:.1f} utt/s, "
      f"train MFU {mfu * 100:.1f} % (3x-fwd vs f32 99 TF), "
      f"last loss {l_last:.3f}", flush=True)

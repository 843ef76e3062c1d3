"""Training-MFU decomposition probe (VERDICT r3 #5: 53 % -> >=60 % or
publish the ceiling decomposition).

Flagship WavLM bf16 b64 fine-tune step (the measured-best config,
320 utt/s / 53 % f32-basis MFU) decomposed into arms that isolate each
non-MXU cost, plus candidate levers:

  base        fwd+bwd+adam, dropout on, CTC loss     (reproduces 320)
  fwd         forward+loss only                      (sizes the bwd)
  noctc       fwd+bwd+adam with mean-square loss     (sizes CTC fwd+bwd)
  nodrop      fwd+bwd+adam, deterministic forward    (sizes dropout RNG)
  optbf16     adam moments in bf16                   (lever: HBM traffic)
  accum2      2x b32 microbatch grad accumulation    (lever: donated accum)

Run per arm in its own subprocess (axon fault isolation):
    for a in base fwd noctc nodrop optbf16 accum2; do
      PYTHONPATH=/root/.axon_site:/root/repo timeout 1200 \
        python docs/runs/train_mfu_probe.py $a; echo "$a rc=$?"; done
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
BATCH = 32 if arm == "accum2" else 64
T, S, ITERS = 48000, 24, 8
print("backend:", jax.default_backend(), "arm:", arm, flush=True)

model = _flagship_wavlm(n_lang=3, dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
deterministic = arm == "nodrop"

with jax.default_device(cpu):
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, 4000), jnp.float32) + 1e-3,
        jnp.full((2,), 4000, jnp.int32), deterministic=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if arm == "optbf16":
        tx = optax.adam(1e-4, mu_dtype=jnp.bfloat16)
    else:
        tx = optax.adam(1e-4)
    opt_state = jax.jit(tx.init, backend="cpu")(params)

params = jax.device_put(params, dev)
batch_stats = jax.device_put(batch_stats, dev)
opt_state = jax.device_put(opt_state, dev)
lengths = jax.device_put(jnp.full((BATCH,), T, jnp.int32), dev)
text_lengths = jax.device_put(jnp.full((BATCH,), S, jnp.int32), dev)


def loss_fn(params, batch_stats, wavs, texts, langs, key):
    (logits, feat_lens), mut = model.apply(
        {"params": params, "batch_stats": batch_stats},
        wavs, lengths, deterministic=deterministic,
        rngs=None if deterministic else {"dropout": key},
        mutable=["batch_stats"])
    own = jnp.take_along_axis(logits, langs[None, :, None, None], axis=0)[0]
    lp = jax.nn.log_softmax(own.astype(jnp.float32), axis=-1)
    if arm == "noctc":
        loss = jnp.mean(lp**2)
    else:
        loss = ctc_loss(lp, texts, feat_lens, text_lengths, blank=-1)
    return loss, mut["batch_stats"]


if arm == "fwd":
    def step(params, opt_state, batch_stats, wavs, texts, langs, key):
        loss, new_bs = loss_fn(params, batch_stats, wavs, texts, langs, key)
        return params, opt_state, new_bs, loss
elif arm == "accum2":
    def step(params, opt_state, batch_stats, w1, t1, l1, w2, t2, l2, key):
        (loss1, bs), g1 = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, w1, t1, l1, key)
        (loss2, bs), g2 = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bs, w2, t2, l2, key)
        grads = jax.tree_util.tree_map(lambda a, b: (a + b) * 0.5, g1, g2)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state, bs,
                (loss1 + loss2) * 0.5)
else:
    def step(params, opt_state, batch_stats, wavs, texts, langs, key):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, wavs, texts, langs, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state, new_bs,
                loss)

jstep = jax.jit(step, donate_argnums=(0, 1, 2))


def make_batch(i):
    r = np.random.RandomState(i)
    out = (jnp.asarray(r.randn(BATCH, T).astype(np.float32) * 0.1),
           jnp.asarray(r.randint(0, 39, (BATCH, S)).astype(np.int32)),
           jnp.asarray(r.randint(0, 3, (BATCH,)).astype(np.int32)))
    if arm == "accum2":
        out = out + (jnp.asarray(r.randn(BATCH, T).astype(np.float32) * 0.1),
                     jnp.asarray(r.randint(0, 39, (BATCH, S))
                                 .astype(np.int32)),
                     jnp.asarray(r.randint(0, 3, (BATCH,))
                                 .astype(np.int32)))
    return out


key = jax.device_put(jax.random.PRNGKey(42), dev)
b0 = make_batch(0)
t0 = time.perf_counter()
params, opt_state, batch_stats, loss = jstep(
    params, opt_state, batch_stats, *b0, key)
l0 = float(loss)  # host fetch = true sync on this backend
print(f"compile+first {time.perf_counter() - t0:.1f}s loss {l0:.3f}",
      flush=True)

batches = [make_batch(i + 1) for i in range(ITERS)]
for bt in batches:
    jax.block_until_ready(bt)
t0 = time.perf_counter()
for bt in batches:
    params, opt_state, batch_stats, loss = jstep(
        params, opt_state, batch_stats, *bt, key)
l_last = float(loss)
dt = (time.perf_counter() - t0) / ITERS
eff_batch = BATCH * (2 if arm == "accum2" else 1)
utt_s = eff_batch / dt
fwd_flops = 54.85e9
factor = 1.0 if arm == "fwd" else 3.0
mfu_f32 = factor * fwd_flops * utt_s / 99.0e12
print(f"{arm}: {dt * 1e3:.1f} ms/step, {utt_s:.1f} utt/s, "
      f"{factor:.0f}x-fwd MFU(f32 99TF basis) {mfu_f32 * 100:.1f} %, "
      f"last loss {l_last:.3f}", flush=True)

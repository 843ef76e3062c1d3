"""Fine-grained bisect of the on-chip train-graph fault.

Stages build up from encoder-only grad to the full task step; run with
  python /tmp/bisect_train.py <stage>
stages: enc_grad | ctc_grad | head_grad | full_step | full_nojit | full_remat
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax

STAGE = sys.argv[1]

rng = np.random.RandomState(0)
B, T = 4, 24000
wavs = jnp.asarray(rng.randn(B, T).astype(np.float32) * 0.1)
wav_lengths = jnp.asarray([24000, 20000, 16000, 12000], jnp.int32)

from speechlid_tpu.ops.frontend import fused_frontend
from speechlid_tpu.models.conformer import ConformerModel

# CPU-backend setup: NO eager device ops before the graphs under test
# (eager frontend destabilizes the worker for later grad graphs)
feats, f_len = jax.jit(fused_frontend, backend="cpu")(wavs, wav_lengths)
print("feats ok (cpu)", feats.shape)

enc = ConformerModel(n_blocks=2, encoder_dim=64, heads=4, dim_head=16,
                     sub_sampling=4)
ev = jax.jit(enc.init, backend="cpu")(
    {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0),
     "stochastic_depth": jax.random.PRNGKey(0)}, feats, f_len)

if STAGE == "enc_grad":
    @jax.jit
    def step(params):
        def loss_fn(p):
            out = enc.apply(dict(ev, params=p), feats, f_len,
                            deterministic=True)
            return jnp.mean(out ** 2)
        l, g = jax.value_and_grad(loss_fn)(ev["params"])
        return l
    for i in range(10):
        l = float(step(ev["params"]))
    print("enc_grad OK", l)
    sys.exit(0)

from speechlid_tpu.ops.ctc import ctc_loss

if STAGE == "ctc_grad":
    texts = jnp.tile(jnp.asarray([1, 2, 3, 0], jnp.int32), (B, 1))
    text_lengths = jnp.full((B,), 3, jnp.int32)
    import flax.linen as nn

    class Head(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(5)(x)

    head = Head()
    hv = head.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 64)))

    @jax.jit
    def step(params, hparams):
        def loss_fn(p, hp):
            out = enc.apply(dict(ev, params=p), feats, f_len,
                            deterministic=True)
            lens = enc.subsampled_lengths(f_len)
            logits = head.apply(dict(hv, params=hp), out)
            lp = jax.nn.log_softmax(logits, axis=-1)
            return jnp.mean(ctc_loss(lp, texts, lens, text_lengths, blank=-1))
        l, g = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, hparams)
        return l
    for i in range(10):
        l = float(step(ev["params"], hv["params"]))
    print("ctc_grad OK", l)
    sys.exit(0)

# full task step (known-crashing config) with optional de-jit
from speechlid_tpu.tasks.lid_asr import LidASRTask
from speechlid_tpu.data.tokenizer import CTCTokenizer

vocab = ["a", "b", "c", "d"]
toks = {"aa": CTCTokenizer(vocab), "bb": CTCTokenizer(vocab)}
task = LidASRTask(
    lang2vocab={"aa": 4, "bb": 4}, lang2index={"aa": 0, "bb": 1},
    tokenizers=toks, n_blocks=2, encoder_dim=64, heads=4, dim_head=16,
    sub_sampling=4, head_dim_head=16, head_num_head=4, lr=1e-3,
    mask_times=0, t_stretch=False, schedule=None,
    remat=(STAGE == "full_remat"),
) if STAGE != "specaug_step" else LidASRTask(
    lang2vocab={"aa": 4, "bb": 4}, lang2index={"aa": 0, "bb": 1},
    tokenizers=toks, n_blocks=2, encoder_dim=64, heads=4, dim_head=16,
    sub_sampling=4, head_dim_head=16, head_num_head=4, lr=1e-3,
    mask_times=2, t_stretch=True, schedule=None,
)
batch = {
    "wavs": np.asarray(wavs), "wav_lengths": np.asarray(wav_lengths),
    "texts": np.tile(np.asarray([1, 2, 3, 0], np.int32), (B, 1)),
    "text_lengths": np.full((B,), 3, np.int32),
    "langs": np.asarray([0, 1, 0, 1], np.int32),
}
variables = task.init_variables(jax.random.PRNGKey(0), batch)
tx = task.config_optim()
if isinstance(tx, tuple):
    tx = tx[0]
opt_state = tx.init(variables["params"])

if STAGE == "head_grad":
    @jax.jit
    def step(variables):
        def loss_fn(params):
            v = dict(variables, params=params)
            loss, _, _ = task.train_loop(
                v, batch,
                rngs={"specaug": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(0),
                      "stochastic_depth": jax.random.PRNGKey(0)})
            return loss
        return jax.value_and_grad(loss_fn)(variables["params"])[0]
    for i in range(10):
        l = float(step(variables))
    print("head_grad OK (train_loop grad, no optimizer)", l)
    sys.exit(0)

if STAGE in ("full_step", "full_nojit", "full_remat", "specaug_step"):
    def step(variables, opt_state, key):
        def loss_fn(params):
            v = dict(variables, params=params)
            loss, metrics, _ = task.train_loop(
                v, batch, rngs={"specaug": key, "dropout": key,
                                "stochastic_depth": key})
            return loss, metrics
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        updates, opt_state = tx.update(grads, opt_state,
                                       variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return dict(variables, params=params), opt_state, loss

    if STAGE != "full_nojit":
        step = jax.jit(step)
    for i in range(10):
        variables, opt_state, loss = step(variables, opt_state,
                                          jax.random.PRNGKey(i))
        print(i, float(loss), flush=True)
    print(STAGE, "OK")

if STAGE in ("two_buckets", "step_eval"):
    # reuse task/variables/opt from above (full_step path not taken)
    def make_step(shape_T):
        b2 = {
            "wavs": np.asarray(rng.randn(B, shape_T).astype(np.float32) * 0.1),
            "wav_lengths": np.asarray([shape_T] * B, np.int32),
            "texts": batch["texts"], "text_lengths": batch["text_lengths"],
            "langs": batch["langs"],
        }

        @jax.jit
        def step(variables, opt_state, key):
            def loss_fn(params):
                v = dict(variables, params=params)
                loss, m, _ = task.train_loop(
                    v, b2, rngs={"specaug": key, "dropout": key,
                                 "stochastic_depth": key})
                return loss
            loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
            updates, new_opt = tx.update(grads, opt_state,
                                         variables["params"])
            params = optax.apply_updates(variables["params"], updates)
            return dict(variables, params=params), new_opt, loss
        return step

    if STAGE == "two_buckets":
        s1, s2 = make_step(16000), make_step(24000)
        v, o = variables, opt_state
        for i in range(5):
            v, o, l1 = s1(v, o, jax.random.PRNGKey(i))
            l1 = float(l1)
        print("bucket1 ok", l1, flush=True)
        for i in range(5):
            v, o, l2 = s2(v, o, jax.random.PRNGKey(100 + i))
            l2 = float(l2)
        print("two_buckets OK", l1, l2)
    else:
        s1 = make_step(16000)

        @jax.jit
        def ev(variables):
            out = task.val_loop(variables, batch)
            return out["loss"]

        v, o = variables, opt_state
        for i in range(5):
            v, o, l1 = s1(v, o, jax.random.PRNGKey(i))
            le = float(ev(v))
        print("step_eval OK", float(l1), le)

if STAGE == "donate_step":
    def dstep(variables, opt_state, key):
        def loss_fn(params):
            v = dict(variables, params=params)
            loss, m, _ = task.train_loop(
                v, batch, rngs={"specaug": key, "dropout": key,
                                "stochastic_depth": key})
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return dict(variables, params=params), opt_state, loss

    dstep = jax.jit(dstep, donate_argnums=(0, 1))
    v, o = variables, opt_state
    for i in range(10):
        v, o, loss = dstep(v, o, jax.random.PRNGKey(i))
        print(i, float(loss), flush=True)
    print("donate_step OK")

if STAGE == "trainer_fit":
    from speechlid_tpu.core import Trainer

    data = []
    for i in range(4):
        b = dict(batch)
        b["wavs"] = batch["wavs"] + 0.001 * i
        data.append(b)
    tr = Trainer(total_epoch=3, use_progress_bar=False, seed=0)
    tr.fit(task, data, data)
    print("trainer_fit OK", tr.global_step)

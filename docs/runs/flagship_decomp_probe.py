"""Where do the flagship's 14.6 ms/step (b128 f32, 62 % MFU) go?

Times three nested graphs on chip with the honest host-fetch sync:

  conv    — ConvFeatureExtractor only: (128, 48000) wav → (128, 149, 512)
  encoder — full WavLM (conv + proj + pos-conv + 12 transformer layers)
  infer   — full MutiLangModel.infer (encoder + 3 heads + discriminator)

Differences give the transformer-stack and heads/scores shares; FLOP
estimates per component give per-component MFU, which says what is
MXU-bound vs bandwidth/latency-bound.

    PYTHONPATH=/root/.axon_site:/root/repo timeout 900 \
        python docs/runs/flagship_decomp_probe.py [batch]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import _flagship_wavlm  # noqa: E402
from speechlid_tpu.models.multilang import MutiLangModel  # noqa: E402
from speechlid_tpu.models.wavlm import ConvFeatureExtractor  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
T = 48000
ITERS = 8
print("backend:", jax.default_backend(), "batch:", BATCH, flush=True)

model = _flagship_wavlm(n_lang=3)
cfg = model.featurizer.config
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
conv_params = {"params": variables["params"]["featurizer"]["wavlm"][
    "feature_extractor"]}
conv_mod = ConvFeatureExtractor(config=cfg)


def f_conv(v, w):
    return conv_mod.apply(v, w)


def f_encoder(v, w):
    # featurizer == WavLMModel → (B, T', 768) last-layer features
    return model.featurizer.apply(
        {"params": v["params"]["featurizer"]}, w, lengths)


def f_infer(v, w):
    return model.apply(v, w, lengths, method=MutiLangModel.infer)["scores"]


def bench(name, fn, v):
    jitted = jax.jit(fn)
    w0 = jax.device_put(
        jnp.asarray(rng.randn(BATCH, T).astype(np.float32) * 0.1), dev)
    t0 = time.perf_counter()
    out = jitted(v, w0)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    compile_s = time.perf_counter() - t0
    inputs = [jax.device_put(
        jnp.asarray(rng.randn(BATCH, T).astype(np.float32) * 0.1), dev)
        for _ in range(ITERS)]
    for w in inputs:  # transfers complete before the timed window
        jax.block_until_ready(w)
    t0 = time.perf_counter()
    for w in inputs:
        out = jitted(v, w)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: compile {compile_s:.1f}s, "
          f"{dt * 1e3:.2f} ms/step, {BATCH / dt:.1f} utt/s", flush=True)
    return dt


t_conv = bench("conv", f_conv, conv_params)
t_enc = bench("encoder", f_encoder, variables)
t_inf = bench("infer", f_infer, variables)

# FLOP estimates (per utt, fwd only, 3 s @ 16 kHz)
t_out = 48000
conv_flops = 0.0
for dim_in, (dim, k, s) in zip(
        [1] + [d for d, _, _ in cfg.conv_layers[:-1]], cfg.conv_layers):
    t_out = (t_out - k) // s + 1
    conv_flops += 2.0 * t_out * dim * dim_in * k
t_frames = t_out  # 149 for 48000
d = cfg.encoder_embed_dim
ffn = cfg.encoder_ffn_embed_dim
# per layer: QKVO 4·d² + attn 2·2·T·d (per frame) + FFN 2·d·ffn
layer = 2.0 * t_frames * (4 * d * d + 2 * ffn * d) + 2.0 * 2 * t_frames * t_frames * d
enc_flops = conv_flops + cfg.encoder_layers * layer
print(f"flops/utt: conv {conv_flops/1e9:.2f} GF, "
      f"transformer {cfg.encoder_layers*layer/1e9:.2f} GF", flush=True)
for name, dt, fl in (("conv", t_conv, conv_flops),
                     ("encoder", t_enc, enc_flops)):
    tf = fl * BATCH / dt / 1e12
    print(f"{name}: sustained {tf:.1f} TF ({tf/99.0*100:.0f} % of f32 peak)",
          flush=True)
print(f"shares of infer step: conv {t_conv/t_inf*100:.0f} %, "
      f"transformer {(t_enc-t_conv)/t_inf*100:.0f} %, "
      f"heads+scores {(t_inf-t_enc)/t_inf*100:.0f} %", flush=True)

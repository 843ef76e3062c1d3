"""Map which encoder component's BACKWARD faults the axon worker.

Usage: python /tmp/bwd_map.py <probe>
probes: mlp | subsample | attention | convmod | ffn | block
Each: tiny module, value_and_grad of mean-square loss, 5 steps.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

probe = sys.argv[1]
rng = np.random.RandomState(0)
print("backend:", jax.default_backend(), flush=True)

from speechlid_tpu.models.conformer import (
    ConformerBlock, ConformerConvModule, Conv2dSubsampling, FeedForward,
    RelPosAttention,
)

B, T, D = 4, 64, 64

if probe == "mlp":
    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(D)(nn.relu(nn.Dense(128)(x)))
    m = M()
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
elif probe == "subsample":
    m = Conv2dSubsampling(D)
    x = jnp.asarray(rng.randn(B, 101, 80).astype(np.float32))
elif probe == "attention":
    m = RelPosAttention(dim=D, dim_head=16, heads=4)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
elif probe == "convmod":
    m = ConformerConvModule(dim=D)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
elif probe == "ffn":
    m = FeedForward(dim=D)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
elif probe == "block":
    m = ConformerBlock(dim=D, dim_head=16, heads=4)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
elif probe.startswith("model"):
    # model_<nblk>blk_T<frames> : full ConformerModel grad at scale
    from speechlid_tpu.models.conformer import ConformerModel
    parts = probe.split("_")
    nblk = int(parts[1].replace("blk", ""))
    frames = int(parts[2][1:])
    m = ConformerModel(n_blocks=nblk, encoder_dim=D, heads=4, dim_head=16,
                       sub_sampling=4)
    x = jnp.asarray(rng.randn(B, frames, 80).astype(np.float32))
elif probe == "subsample301":
    m = Conv2dSubsampling(D)
    x = jnp.asarray(rng.randn(B, 301, 80).astype(np.float32))

if probe not in ("fe_inside", "fe_then_grad", "devinit_grad"):
    v = jax.jit(m.init, backend="cpu")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, x
    )
    v = jax.device_put(v, jax.devices()[0])

    @jax.jit
    def step(params, x):
        def loss_fn(p):
            out = m.apply(dict(v, params=p), x)
            return jnp.mean(out ** 2)
        return jax.value_and_grad(loss_fn)(params)

    for i in range(5):
        l, g = step(v["params"], x)
        l = float(l)
    print(probe, "bwd OK", l)

# scale probes: appended for queue5 (composition/scale bisect)

# --- trigger-discrimination probes (appended) -------------------------------
if probe in ("fe_inside", "fe_then_grad", "devinit_grad"):
    from speechlid_tpu.models.conformer import ConformerModel
    from speechlid_tpu.ops.frontend import fused_frontend

    m2 = ConformerModel(n_blocks=2, encoder_dim=64, heads=4, dim_head=16,
                        sub_sampling=4)
    wavs = jnp.asarray(rng.randn(4, 24000).astype(np.float32) * 0.1)
    wl = jnp.asarray([24000, 20000, 16000, 12000], jnp.int32)

    if probe == "devinit_grad":
        feats, f_len = None, None
        x101 = jnp.asarray(rng.randn(4, 301, 80).astype(np.float32))
        fl = jnp.asarray([301, 251, 201, 151], jnp.int32)
        v2 = m2.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(0),
                      "stochastic_depth": jax.random.PRNGKey(0)}, x101, fl)
        print("on-device init done", flush=True)

        @jax.jit
        def step2(params, x):
            def loss_fn(p):
                return jnp.mean(m2.apply(dict(v2, params=p), x, fl,
                                         deterministic=True) ** 2)
            return jax.value_and_grad(loss_fn)(params)
        for i in range(5):
            l2, _ = step2(v2["params"], x101)
        print("devinit_grad OK", float(l2))

    elif probe == "fe_then_grad":
        feats, f_len = fused_frontend(wavs, wl)
        feats = jax.block_until_ready(feats)
        print("frontend graph done", feats.shape, flush=True)
        v2 = jax.jit(m2.init, backend="cpu")(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(0),
             "stochastic_depth": jax.random.PRNGKey(0)}, feats, f_len)
        v2 = jax.device_put(v2, jax.devices()[0])

        @jax.jit
        def step3(params, x):
            def loss_fn(p):
                return jnp.mean(m2.apply(dict(v2, params=p), x, f_len,
                                         deterministic=True) ** 2)
            return jax.value_and_grad(loss_fn)(params)
        for i in range(5):
            l3, _ = step3(v2["params"], feats)
        print("fe_then_grad OK", float(l3))

    elif probe == "fe_inside":
        xcpu = jnp.zeros((4, 301, 80))
        flcpu = jnp.asarray([301, 251, 201, 151], jnp.int32)
        v2 = jax.jit(m2.init, backend="cpu")(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(0),
             "stochastic_depth": jax.random.PRNGKey(0)}, xcpu, flcpu)
        v2 = jax.device_put(v2, jax.devices()[0])

        @jax.jit
        def step4(params, wavs):
            def loss_fn(p):
                feats, f_len = fused_frontend(wavs, wl)
                return jnp.mean(m2.apply(dict(v2, params=p), feats, f_len,
                                         deterministic=True) ** 2)
            return jax.value_and_grad(loss_fn)(params)
        for i in range(5):
            l4, _ = step4(v2["params"], wavs)
        print("fe_inside OK", float(l4))

"""Map the bf16 failure surface with SMALL graphs (fast compiles).

Usage: python /tmp/bf16_map.py <probe>
probes:
  gemm        bare bf16 matmul 2048^3
  conv1d      bf16 strided conv stack (wavlm extractor shape, 1 layer)
  extractor   full 7-layer conv extractor bf16, 1s audio
  encoder1    1 WavLM encoder layer bf16 (B=4, T=50)
  encoder4    4 WavLM encoder layers bf16
  conformer   tiny Conformer bf16 infer (2 blocks)
  mixed       f32 extractor + bf16 1-layer encoder
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

probe = sys.argv[1]
rng = np.random.RandomState(0)
print("backend:", jax.default_backend(), flush=True)

if probe == "gemm":
    a = jnp.asarray(rng.randn(2048, 2048).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.randn(2048, 2048).astype(np.float32)).astype(jnp.bfloat16)
    out = jax.jit(lambda a, b: a @ b)(a, b)
    print("gemm ok", float(jnp.sum(out.astype(jnp.float32))))

elif probe == "conv1d":
    import flax.linen as nn

    class C(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(512, (10,), strides=(5,), dtype=jnp.bfloat16)(x)

    m = C()
    x = jnp.asarray(rng.randn(2, 16000, 1).astype(np.float32) * 0.1)
    v = m.init(jax.random.PRNGKey(0), x)
    out = jax.jit(m.apply)(v, x)
    print("conv1d ok", out.shape, out.dtype)

elif probe in ("extractor", "encoder1", "encoder4", "mixed"):
    from speechlid_tpu.models.wavlm import WavLM, WavLMConfig

    layers = {"extractor": 0, "encoder1": 1, "encoder4": 4, "mixed": 1}[probe]
    cfg = WavLMConfig(
        encoder_layers=max(layers, 1),
        encoder_embed_dim=256,
        encoder_ffn_embed_dim=1024,
        encoder_attention_heads=4,
        relative_position_embedding=True,
        gru_rel_pos=True,
        mask_prob=0.0,
        dtype=jnp.float32 if probe == "mixed" else jnp.bfloat16,
    )
    m = WavLM(cfg)
    x = jnp.asarray(rng.randn(2, 16000).astype(np.float32) * 0.1)
    v = jax.jit(m.init, backend="cpu")({"params": jax.random.PRNGKey(0)}, x)
    v = jax.device_put(v, jax.devices()[0])
    out = jax.jit(lambda v, x: m.apply(v, x)[0])(v, x)
    out = jax.block_until_ready(out)
    print(probe, "ok", out.shape, out.dtype,
          float(jnp.mean(jnp.abs(out.astype(jnp.float32)))))

elif probe == "conformer":
    from __graft_entry__ import _flagship
    from speechlid_tpu.models.multilang import MutiLangModel

    m = _flagship(n_lang=2, tiny=True, dtype=jnp.bfloat16)
    mel = jnp.asarray(rng.randn(2, 101, 80).astype(np.float32) * 0.1)
    f_len = jnp.asarray([101, 80], jnp.int32)
    key = jax.random.PRNGKey(0)
    v = jax.jit(
        lambda: m.init({"params": key, "dropout": key,
                        "stochastic_depth": key}, mel, f_len,
                       method=MutiLangModel.infer),
        backend="cpu",
    )()
    v = jax.device_put(v, jax.devices()[0])
    out = jax.jit(
        lambda v, mel: m.apply(v, mel, f_len, method=MutiLangModel.infer)
    )(v, mel)
    out = jax.block_until_ready(out)
    print("conformer ok", {k: np.asarray(x).dtype for k, x in out.items()})

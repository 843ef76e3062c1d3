"""Bisect the bf16 Conformer hang INSIDE the block (round-3, VERDICT item 5).

Round 2 established (docs/runs/CHIP_FINDINGS_r2.md "bf16 mapping"): bf16
matmul / strided conv1d / WavLM extractor / WavLM encoder layers all PASS
on the axon chip, but a tiny bf16 Conformer (conv2d subsample +
GLU/depthwise blocks) never finishes compiling.  This script splits the
block into its sub-modules so the failing fusion can be pinned and a
minimal committed repro extracted.

Run each probe in its OWN subprocess under timeout (a hang poisons the
worker):
    for p in subsample2d ff attn glu depthwise convmod bn block \
             block_f32conv model; do
      PYTHONPATH=/root/.axon_site:/root/repo timeout 240 \
        python docs/runs/bf16_conformer_bisect.py $p; echo "$p rc=$?";
    done
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

sys.path.insert(0, "/root/repo")

from speechlid_tpu.models.conformer import (  # noqa: E402
    ConformerBlock,
    ConformerConvModule,
    ConformerModel,
    Conv2dSubsampling,
    FeedForward,
    RelPosAttention,
)

probe = sys.argv[1]
DT = jnp.bfloat16
B, T, D = 4, 80, 144  # tiny: fast compiles, same fusion families
rng = np.random.RandomState(0)
print("backend:", jax.default_backend(), flush=True)


def run(module, x, **call_kw):
    v = jax.jit(module.init, backend="cpu")(jax.random.PRNGKey(0), x, **call_kw)
    v = jax.device_put(v, jax.devices()[0])
    x = jax.device_put(x, jax.devices()[0])
    t0 = time.perf_counter()
    fn = jax.jit(lambda v, x: module.apply(v, x, **call_kw))
    out = jax.block_until_ready(fn(v, x))
    leaf = jax.tree_util.tree_leaves(out)[0]
    print(f"{probe} OK {time.perf_counter() - t0:.1f}s",
          leaf.shape, leaf.dtype,
          float(jnp.sum(jnp.asarray(leaf, jnp.float32))), flush=True)


x = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.1).astype(DT)

if probe == "subsample2d":
    mel = jnp.asarray(rng.randn(B, 128, 80).astype(np.float32) * 0.1)
    run(Conv2dSubsampling(odim=D, dtype=DT), mel)
elif probe == "ff":
    run(FeedForward(D, mult=4, dtype=DT), x)
elif probe == "attn":
    run(RelPosAttention(D, heads=4, dim_head=36, dtype=DT), x)
elif probe == "glu":
    class GLU(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.LayerNorm(dtype=DT)(x)
            y = nn.Dense(2 * 2 * D, dtype=DT)(y)
            a, g = jnp.split(y, 2, axis=-1)
            return a * jax.nn.sigmoid(g)

    run(GLU(), x)
elif probe == "depthwise":
    class DW(nn.Module):
        @nn.compact
        def __call__(self, x):
            inner = 2 * D
            y = nn.Dense(inner, dtype=DT)(x)
            return nn.Conv(inner, (31,), padding="SAME",
                           feature_group_count=inner, dtype=DT,
                           name="depthwise")(y)

    run(DW(), x)
elif probe == "bn":
    class BN(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.BatchNorm(use_running_average=True, dtype=DT)(x)

    run(BN(), x)
elif probe == "convmod":
    run(ConformerConvModule(D, dtype=DT), x)
elif probe == "block":
    run(ConformerBlock(D, dim_head=36, heads=4, dtype=DT), x)
elif probe == "block_f32conv":
    # workaround candidate: f32 island around the conv module only
    class BlockF32Conv(nn.Module):
        @nn.compact
        def __call__(self, x):
            ff1 = FeedForward(D, 4, dtype=DT, name="ff1")
            x = 0.5 * ff1(nn.LayerNorm(dtype=DT)(x)) + x
            attn = RelPosAttention(D, 4, 36, dtype=DT, name="attn")
            x = attn(nn.LayerNorm(dtype=DT)(x)) + x
            conv = ConformerConvModule(D, dtype=jnp.float32, name="conv")
            x = conv(x.astype(jnp.float32)).astype(DT) + x
            ff2 = FeedForward(D, 4, dtype=DT, name="ff2")
            x = 0.5 * ff2(nn.LayerNorm(dtype=DT)(x)) + x
            return nn.LayerNorm(dtype=DT, name="post_norm")(x)

    run(BlockF32Conv(), x)
elif probe == "model":
    mel = jnp.asarray(rng.randn(B, 128, 80).astype(np.float32) * 0.1)
    m = ConformerModel(n_blocks=2, encoder_dim=D, heads=4, dim_head=36,
                       sub_sampling=4, dtype=DT)
    run(m, mel)
else:
    raise SystemExit(f"unknown probe {probe}")

"""Second-level bisect: WHICH fusion inside bf16 ConformerConvModule hangs.

Level 1 (bf16_conformer_bisect.py, run on-chip 2026-08-17) established:
every sub-piece passes alone in bf16 (GLU 0.6s, depthwise 0.7s, BN 0.4s)
but the full ConformerConvModule (LN -> Dense -> GLU -> depthwise k31 ->
BN -> swish -> Dense) never finishes compiling (rc=143 at 240s).  This
script composes adjacent pairs/triples to pin the minimal hanging fusion.

First queue results (on-chip 2026-08-17): ``glu_dw`` rc=143 HANG,
``dw_bn`` rc=143 HANG — the depthwise grouped conv hangs as soon as ANY
elementwise producer/consumer can fuse with it in bf16.  The ``bar_*``
probes test whether ``jax.lax.optimization_barrier`` around the conv
breaks the poisonous fusion (if yes: full-bf16 models become shippable
with a barrier inside ConformerConvModule instead of an f32 island).

Run each probe in its OWN subprocess under timeout:
    for p in glu_bar_dw dw_bar_bn bar_dw_bar full_bar \
             dw_bn_swish glu_dw_bn bn_swish_pw glu_dw_swish \
             full_no_bn full_no_glu full; do
      PYTHONPATH=/root/.axon_site:/root/repo timeout 240 \
        python docs/runs/bf16_convmod_bisect.py $p; echo "$p rc=$?";
    done
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

sys.path.insert(0, "/root/repo")

probe = sys.argv[1]
DT = jnp.bfloat16
B, T, D = 4, 80, 144
INNER = 2 * D  # expansion_factor=2
rng = np.random.RandomState(0)
print("backend:", jax.default_backend(), flush=True)


def run(module, x):
    v = jax.jit(module.init, backend="cpu")(jax.random.PRNGKey(0), x)
    v = jax.device_put(v, jax.devices()[0])
    x = jax.device_put(x, jax.devices()[0])
    t0 = time.perf_counter()
    fn = jax.jit(lambda v, x: module.apply(v, x))
    out = jax.block_until_ready(fn(v, x))
    leaf = jax.tree_util.tree_leaves(out)[0]
    print(f"{probe} OK {time.perf_counter() - t0:.1f}s",
          leaf.shape, leaf.dtype,
          float(jnp.sum(jnp.asarray(leaf, jnp.float32))), flush=True)


def glu(y):
    a, g = jnp.split(y, 2, axis=-1)
    return a * jax.nn.sigmoid(g)


def dw(y, name="depthwise"):
    return nn.Conv(INNER, (31,), padding="SAME", feature_group_count=INNER,
                   dtype=DT, name=name)(y)


def bn(y):
    return nn.BatchNorm(use_running_average=True, dtype=DT, name="bn")(y)


def swish(y):
    return y * jax.nn.sigmoid(y)


class Probe(nn.Module):
    kind: str

    @nn.compact
    def __call__(self, x):
        k = self.kind
        bar = jax.lax.optimization_barrier
        if k == "glu_dw":
            y = glu(nn.Dense(2 * INNER, dtype=DT)(nn.LayerNorm(dtype=DT)(x)))
            return dw(y)
        if k == "glu_bar_dw":
            y = glu(nn.Dense(2 * INNER, dtype=DT)(nn.LayerNorm(dtype=DT)(x)))
            return dw(bar(y))
        if k == "dw_bar_bn":
            y = nn.Dense(INNER, dtype=DT)(x)
            return bn(bar(dw(y)))
        if k == "bar_dw_bar":  # barriers on BOTH sides of the conv
            y = glu(nn.Dense(2 * INNER, dtype=DT)(nn.LayerNorm(dtype=DT)(x)))
            y = bar(dw(bar(y)))
            return nn.Dense(D, dtype=DT)(swish(bn(y)))
        if k == "full_bar":  # production candidate: ConformerConvModule
            from speechlid_tpu.models.conformer import ConformerConvModule
            return ConformerConvModule(D, dtype=DT, conv_barrier=True)(x)
        if k == "dw_bn":
            y = nn.Dense(INNER, dtype=DT)(x)
            return bn(dw(y))
        if k == "dw_bn_swish":
            y = nn.Dense(INNER, dtype=DT)(x)
            return swish(bn(dw(y)))
        if k == "glu_dw_bn":
            y = glu(nn.Dense(2 * INNER, dtype=DT)(nn.LayerNorm(dtype=DT)(x)))
            return bn(dw(y))
        if k == "bn_swish_pw":
            y = nn.Dense(INNER, dtype=DT)(x)
            return nn.Dense(D, dtype=DT)(swish(bn(y)))
        if k == "glu_dw_swish":  # full minus BN normalization semantics
            y = glu(nn.Dense(2 * INNER, dtype=DT)(nn.LayerNorm(dtype=DT)(x)))
            return nn.Dense(D, dtype=DT)(swish(dw(y)))
        if k == "full_no_bn":
            y = glu(nn.Dense(2 * INNER, dtype=DT)(nn.LayerNorm(dtype=DT)(x)))
            return nn.Dense(D, dtype=DT)(swish(dw(y)))
        if k == "full_no_glu":
            y = nn.Dense(INNER, dtype=DT)(nn.LayerNorm(dtype=DT)(x))
            return nn.Dense(D, dtype=DT)(swish(bn(dw(y))))
        if k == "full":
            from speechlid_tpu.models.conformer import ConformerConvModule
            return ConformerConvModule(D, dtype=DT)(x)
        raise SystemExit(f"unknown probe {k}")


x = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.1).astype(DT)
run(Probe(kind=probe), x)

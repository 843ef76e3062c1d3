"""On-chip probe for the Pallas depthwise-conv1d kernel (runbook step 2).

Three probes, each runnable in its own subprocess under ``timeout``:

  parity  — bf16 kernel output + custom-VJP grads on chip vs an f32 CPU
            grouped-conv reference (tolerances sized for bf16 rounding).
  timing  — kernel vs barrier-fenced XLA grouped conv, bf16, realistic
            Conformer shapes (B=16, T=80, C=288, k=31), steady-state.
  convmod — full-bf16 ConformerConvModule(conv_impl='pallas'): the
            structural fix for the round-2 fusion hang.  Expected: no
            hang, no barrier needed.

    for p in parity timing convmod; do
      PYTHONPATH=/root/.axon_site:/root/repo timeout 240 \
        python docs/runs/pallas_dw_chip_probe.py $p; echo "$p rc=$?";
    done
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from speechlid_tpu.ops.pallas.depthwise_kernel import (  # noqa: E402
    depthwise_conv1d,
)

probe = sys.argv[1]
rng = np.random.RandomState(0)
B, T, C, K = 16, 80, 288, 31
x_np = (rng.randn(B, T, C) * 0.1).astype(np.float32)
w_np = (rng.randn(K, C) * 0.1).astype(np.float32)
b_np = (rng.randn(C) * 0.1).astype(np.float32)
dev = jax.devices()[0]
cpu = jax.devices("cpu")[0]
print("backend:", jax.default_backend(), flush=True)


def cpu_ref_f32():
    """f32 grouped-conv reference on the CPU backend (never touches the
    broken axon fusion path)."""
    def f(x, w, b):
        k, c = w.shape
        y = jax.lax.conv_general_dilated(
            x, w[:, None, :], (1,), [((k - 1) // 2, k // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
        )
        return y + b[None, None, :]
    return jax.jit(f, backend="cpu")


if probe == "parity":
    xb = jax.device_put(jnp.asarray(x_np, jnp.bfloat16), dev)
    wb = jax.device_put(jnp.asarray(w_np, jnp.bfloat16), dev)
    bb = jax.device_put(jnp.asarray(b_np, jnp.bfloat16), dev)
    t0 = time.perf_counter()
    out = jax.block_until_ready(jax.jit(depthwise_conv1d)(xb, wb, bb))
    print(f"fwd compiled+ran {time.perf_counter() - t0:.1f}s", flush=True)
    ref = cpu_ref_f32()(jnp.asarray(x_np), jnp.asarray(w_np),
                        jnp.asarray(b_np))
    err = float(jnp.max(jnp.abs(np.asarray(out, np.float32) - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    print(f"fwd max_abs_err={err:.4g} (scale {scale:.3g})", flush=True)
    assert err < 0.02 * max(scale, 1.0), "bf16 fwd parity out of tolerance"

    def loss(x, w, b):
        return jnp.sum(depthwise_conv1d(x, w, b).astype(jnp.float32) ** 2)

    t0 = time.perf_counter()
    gx, gw, gb = jax.block_until_ready(
        jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(xb, wb, bb))
    print(f"bwd compiled+ran {time.perf_counter() - t0:.1f}s", flush=True)

    def ref_loss(x, w, b):
        k, c = w.shape
        y = jax.lax.conv_general_dilated(
            x, w[:, None, :], (1,), [((k - 1) // 2, k // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
        ) + b[None, None, :]
        return jnp.sum(y ** 2)

    rgx, rgw, rgb = jax.jit(jax.grad(ref_loss, argnums=(0, 1, 2)),
                            backend="cpu")(
        jnp.asarray(x_np), jnp.asarray(w_np), jnp.asarray(b_np))
    for name, g, r in (("gx", gx, rgx), ("gw", gw, rgw), ("gb", gb, rgb)):
        e = float(jnp.max(jnp.abs(np.asarray(g, np.float32) - r)))
        s = float(jnp.max(jnp.abs(r)))
        print(f"{name} max_abs_err={e:.4g} (scale {s:.3g})", flush=True)
        assert e < 0.03 * max(s, 1.0), f"bf16 {name} parity out of tolerance"
    print("parity OK", flush=True)

elif probe == "timing":
    xb = jax.device_put(jnp.asarray(x_np, jnp.bfloat16), dev)
    wb = jax.device_put(jnp.asarray(w_np, jnp.bfloat16), dev)
    bb = jax.device_put(jnp.asarray(b_np, jnp.bfloat16), dev)

    def xla_fenced(x, w, b):
        # the barrier workaround variant (barrier keeps the grouped conv
        # unfused, which is what makes it compile at all in bf16)
        x = jax.lax.optimization_barrier(x)
        k, c = w.shape
        y = jax.lax.conv_general_dilated(
            x, w[:, None, :], (1,), [((k - 1) // 2, k // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
        )
        return jax.lax.optimization_barrier(y) + b[None, None, :]

    for name, fn in (("pallas", jax.jit(depthwise_conv1d)),
                     ("xla_fenced", jax.jit(xla_fenced))):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(xb, wb, bb))
        compile_s = time.perf_counter() - t0
        # steady state
        n = 50
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(xb, wb, bb)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: compile+first {compile_s:.2f}s, "
              f"steady {dt * 1e6:.0f} us/call", flush=True)

elif probe == "convmod":
    import flax.linen as nn  # noqa: F401
    from speechlid_tpu.models.conformer import ConformerConvModule

    D = 144
    mod = ConformerConvModule(D, dtype=jnp.bfloat16, conv_impl="pallas",
                              conv_barrier=False)
    x = jnp.asarray((rng.randn(4, 80, D) * 0.1).astype(np.float32),
                    jnp.bfloat16)
    v = jax.jit(mod.init, backend="cpu")(jax.random.PRNGKey(0), x)
    v = jax.device_put(v, dev)
    x = jax.device_put(x, dev)
    t0 = time.perf_counter()
    out = jax.block_until_ready(jax.jit(lambda v, x: mod.apply(v, x))(v, x))
    print(f"convmod(pallas, bf16, NO barrier) OK "
          f"{time.perf_counter() - t0:.1f}s", out.shape, out.dtype,
          float(jnp.sum(out.astype(jnp.float32))), flush=True)
else:
    raise SystemExit(f"unknown probe {probe}")

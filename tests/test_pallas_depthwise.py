"""Pallas depthwise-conv kernel: exact parity vs the XLA grouped conv
(forward + all grads), and drop-in param compatibility inside
ConformerConvModule.  Runs in interpret mode on CPU."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

os.environ["SPEECHLID_DW_INTERPRET"] = "1"  # force the kernel (interpret)
# off-TPU the production path dispatches to the XLA grouped conv; these
# tests exist to pin the KERNEL's numerics
from speechlid_tpu.ops.pallas.depthwise_kernel import depthwise_conv1d


def _xla_ref(x, w, b):
    c = x.shape[-1]
    return lax.conv_general_dilated(
        x, w[:, None, :], (1,), "SAME",
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
    ) + b


class TestKernelParity:
    @pytest.mark.parametrize("shape,k", [
        ((2, 37, 288), 31),   # conformer inner after 4x subsample, 3 s
        ((1, 7, 64), 31),     # utterance shorter than the kernel
        ((3, 100, 129), 15),  # non-128 channels, even-ish T
        ((2, 50, 96), 4),     # even kernel (asymmetric SAME halo)
    ])
    def test_forward(self, shape, k):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(*shape), jnp.float32)
        w = jnp.asarray(rng.randn(k, shape[-1]) * 0.1, jnp.float32)
        b = jnp.asarray(rng.randn(shape[-1]) * 0.1, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(depthwise_conv1d(x, w, b)),
            np.asarray(_xla_ref(x, w, b)), rtol=1e-5, atol=1e-5,
        )

    def test_grads(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 37, 288), jnp.float32)
        w = jnp.asarray(rng.randn(31, 288) * 0.1, jnp.float32)
        b = jnp.asarray(rng.randn(288) * 0.1, jnp.float32)
        t = jnp.asarray(rng.randn(2, 37, 288), jnp.float32)

        def f(x, w, b):
            return jnp.sum((depthwise_conv1d(x, w, b) - t) ** 2)

        def f_ref(x, w, b):
            return jnp.sum((_xla_ref(x, w, b) - t) ** 2)

        g = jax.jit(jax.grad(f, argnums=(0, 1, 2)))(x, w, b)
        gr = jax.jit(jax.grad(f_ref, argnums=(0, 1, 2)))(x, w, b)
        for a, r in zip(g, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=1e-4, atol=1e-4)

    def test_bf16_accumulates_f32(self):
        """bf16 in/out with f32 accumulation: closer to the f32 result
        than a naive bf16 accumulate would be."""
        rng = np.random.RandomState(2)
        x32 = rng.randn(1, 64, 128).astype(np.float32)
        w32 = (rng.randn(31, 128) * 0.1).astype(np.float32)
        b32 = np.zeros(128, np.float32)
        ref = np.asarray(_xla_ref(jnp.asarray(x32), jnp.asarray(w32),
                                  jnp.asarray(b32)))
        out = np.asarray(depthwise_conv1d(
            jnp.asarray(x32, jnp.bfloat16), jnp.asarray(w32, jnp.bfloat16),
            jnp.asarray(b32, jnp.bfloat16)).astype(jnp.float32))
        assert out.dtype == np.float32 and np.isfinite(out).all()
        # bf16 inputs quantize, but f32 accumulation keeps error ~1e-2
        np.testing.assert_allclose(out, ref, rtol=0.1, atol=0.15)


class TestConvModuleImpl:
    def test_pallas_impl_matches_xla_with_same_params(self):
        """conv_impl='pallas' is a drop-in: identical param tree, same
        output as the XLA grouped conv."""
        from speechlid_tpu.models.conformer import ConformerConvModule

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 50, 64), jnp.float32)
        mx = ConformerConvModule(dim=64, conv_impl="xla", conv_barrier=False)
        mp = ConformerConvModule(dim=64, conv_impl="pallas")
        keys = {"params": jax.random.PRNGKey(0)}
        vx = mx.init(keys, x)
        vp = mp.init(keys, x)
        assert (jax.tree_util.tree_structure(vx)
                == jax.tree_util.tree_structure(vp))
        np.testing.assert_allclose(
            np.asarray(mp.apply(vx, x)), np.asarray(mx.apply(vx, x)),
            rtol=2e-5, atol=2e-5,
        )

    def test_auto_is_xla_off_axon(self, monkeypatch):
        """Off the axon deployment, auto must keep the XLA conv (and no
        barrier) — pallas/barrier are axon-specific workarounds."""
        monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
        monkeypatch.delenv("SPEECHLID_CONV_BARRIER", raising=False)
        from speechlid_tpu.models.conformer import _on_axon_backend

        assert not _on_axon_backend()
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
        assert _on_axon_backend()
        monkeypatch.setenv("SPEECHLID_CONV_BARRIER", "0")
        assert not _on_axon_backend()

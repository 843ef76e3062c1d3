"""Pipeline (pp) + sequence (sp) parallelism on the virtual 8-device CPU
mesh: numerical parity vs the plain sequential program, forward and grad.
(The reference scales only by DDP — SURVEY.md §2.5; pp/sp are the
TPU-native scale-out beyond it.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speechlid_tpu.models.conformer import ConformerBlock
from speechlid_tpu.parallel.pipeline import (
    pipeline_apply,
    pipeline_bubble_fraction,
    shard_time,
    split_microbatches,
    stack_stage_params,
)

jax.config.update("jax_platforms", "cpu")


def _mesh(shape, names):
    n = int(np.prod(shape))
    return Mesh(np.asarray(jax.devices()[:n]).reshape(shape), names)


class TestPipelineApply:
    @pytest.fixture(scope="class")
    def setup(self):
        n_stages, dim = 4, 32
        mesh = _mesh((2, 4), ("data", "stage"))
        block = ConformerBlock(dim=dim, heads=2, dim_head=16)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(8, 20, dim), jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(0), n_stages)
        plist = [block.init(k, x) for k in keys]  # params + batch_stats
        stacked = stack_stage_params(plist)

        def stage_fn(v, a):
            return block.apply(v, a)

        def sequential(plist_stacked, x):
            def body(a, p):
                return stage_fn(p, a), None

            out, _ = jax.lax.scan(body, x, plist_stacked)
            return out

        return mesh, stage_fn, stacked, x, sequential

    def test_forward_parity(self, setup):
        mesh, stage_fn, stacked, x, sequential = setup
        ref = np.asarray(jax.jit(sequential)(stacked, x))
        for m in (4, 8):  # M == S and M > S schedules
            out = jax.jit(
                lambda p, a, m=m: pipeline_apply(
                    stage_fn, p, a, mesh, n_microbatch=m
                )
            )(stacked, x)
            np.testing.assert_allclose(np.asarray(out), ref,
                                       rtol=2e-5, atol=2e-5)

    def test_grad_parity(self, setup):
        mesh, stage_fn, stacked, x, sequential = setup

        def loss_pipe(p, a):
            return jnp.mean(pipeline_apply(stage_fn, p, a, mesh) ** 2)

        def loss_seq(p, a):
            return jnp.mean(sequential(p, a) ** 2)

        g_pipe = jax.jit(jax.grad(loss_pipe))(stacked, x)
        g_seq = jax.jit(jax.grad(loss_seq))(stacked, x)
        flat_p, _ = jax.tree_util.tree_flatten(g_pipe)
        flat_s, _ = jax.tree_util.tree_flatten(g_seq)
        for a, b in zip(flat_p, flat_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-5, atol=5e-5)

    def test_dp_axis_composes(self, setup):
        """Batch sharded on 'data' while the trunk pipelines on 'stage'."""
        mesh, stage_fn, stacked, x, sequential = setup
        ref = np.asarray(jax.jit(sequential)(stacked, x))
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        out = jax.jit(
            lambda p, a: pipeline_apply(stage_fn, p, a, mesh)
        )(stacked, xs)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)

    def test_bad_microbatch_raises(self, setup):
        mesh, stage_fn, stacked, x, _ = setup
        with pytest.raises(ValueError):
            split_microbatches(x, 3)

    def test_bubble_fraction(self):
        assert pipeline_bubble_fraction(4, 4) == pytest.approx(3 / 7)
        assert pipeline_bubble_fraction(1, 8) == 0.0


class TestShardTime:
    def test_frontend_parity_time_sharded(self):
        """Mel frontend computed with T sharded over 'seq' must equal the
        unsharded result (GSPMD inserts gathers where needed)."""
        from speechlid_tpu.ops.frontend import normalize_wav, wav2mel

        mesh = _mesh((2, 4), ("data", "seq"))
        rng = np.random.RandomState(0)
        wavs = jnp.asarray(rng.randn(4, 16000) * 0.1, jnp.float32)
        lengths = jnp.asarray([16000, 12000, 16000, 8000], jnp.int32)

        def fe(w, l):
            mel = wav2mel(normalize_wav(w, l), lengths=l)  # (B, mel, T)
            return shard_time(mel, mesh, time_dim=2)

        ref = np.asarray(jax.jit(lambda w, l: wav2mel(normalize_wav(w, l),
                                                      lengths=l))(wavs, lengths))
        with mesh:
            out = np.asarray(jax.jit(fe)(wavs, lengths))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_identity_when_axis_missing_or_ragged(self):
        mesh = _mesh((8,), ("data",))
        x = jnp.zeros((2, 10, 4))
        assert shard_time(x, mesh) is x  # no 'seq' axis
        mesh2 = _mesh((2, 4), ("data", "seq"))
        y = jnp.zeros((2, 10, 4))  # 10 % 4 != 0 → replicate, not crash
        assert shard_time(y, mesh2) is y

"""FaSNet-TAC + SELDNet rebuild tests (reference se/models/FaSNet.py,
se/models/SELDNet.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speechlid_tpu.models.fasnet import (
    FaSNetTAC,
    merge_segments,
    overlap_add,
    sliding_corr,
    sliding_cosine,
    split_segments,
)
from speechlid_tpu.models.seldnet import seldnet_augmented, seldnet_vanilla


def _tiny_fasnet(**kw):
    conf = dict(enc_dim=16, feature_dim=16, hidden_dim=24, n_layers=1,
                segment_size=10, nspk=1)
    conf.update(kw)
    return FaSNetTAC(**conf)


class TestSlidingPrimitives:
    def test_sliding_corr_matches_naive(self):
        rng = np.random.RandomState(0)
        ref = rng.randn(3, 20).astype(np.float32)
        ker = rng.randn(3, 5).astype(np.float32)
        got = np.asarray(sliding_corr(jnp.asarray(ref), jnp.asarray(ker), 16))
        want = np.stack([
            [np.dot(ref[i, k:k + 5], ker[i]) for k in range(16)]
            for i in range(3)
        ])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_sliding_corr_broadcasts(self):
        """ref (B, 1, n) vs kernel (B, 4, m) — the FaSNet fan-out shape."""
        rng = np.random.RandomState(1)
        ref = jnp.asarray(rng.randn(2, 1, 30).astype(np.float32))
        ker = jnp.asarray(rng.randn(2, 4, 7).astype(np.float32))
        out = sliding_corr(ref, ker, 24)
        assert out.shape == (2, 4, 24)

    def test_sliding_cosine_bounded_and_peaked(self):
        """Cosine of a signal against a shifted copy of itself peaks at 1
        at the true lag."""
        rng = np.random.RandomState(2)
        target = rng.randn(9).astype(np.float32)
        ref = np.zeros(40, np.float32)
        ref[13:22] = target
        cos = np.asarray(
            sliding_cosine(jnp.asarray(ref)[None], jnp.asarray(target)[None])
        )[0]
        assert np.all(cos <= 1.0 + 1e-4) and np.all(cos >= -1.0 - 1e-4)
        assert np.argmax(cos) == 13
        assert cos[13] == pytest.approx(1.0, abs=1e-4)

    def test_overlap_add(self):
        wins = jnp.ones((1, 5, 4))
        out = np.asarray(overlap_add(wins, 2))
        assert out.shape == (1, 12)
        # interior positions covered by 2 windows, edges by 1
        np.testing.assert_array_equal(out[0, 2:-2], 2.0)
        np.testing.assert_array_equal(out[0, :2], 1.0)

    def test_split_merge_roundtrip(self):
        """merge(split(x)) == 2·x (every sample covered exactly twice with
        the reference's lead/trail stride padding)."""
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 8, 107).astype(np.float32))
        back = np.asarray(merge_segments(split_segments(x, 10), 107))
        np.testing.assert_allclose(back, 2.0 * np.asarray(x), rtol=1e-5,
                                   atol=1e-5)


class TestFaSNetTAC:
    @pytest.mark.slow
    def test_forward_shapes_jit_grad(self):
        rng = np.random.RandomState(0)
        model = _tiny_fasnet()
        wav = jnp.asarray(rng.randn(2, 3, 8000).astype(np.float32) * 0.1)
        params = model.init(jax.random.PRNGKey(0), wav)
        out = jax.jit(model.apply)(params, wav)
        assert out.shape == (2, 1, 8000)
        assert np.isfinite(np.asarray(out)).all()

        def loss(p):
            return jnp.mean(model.apply(p, wav) ** 2)

        g = jax.grad(loss)(params)
        gnorm = sum(
            float(jnp.sum(x**2)) for x in jax.tree_util.tree_leaves(g)
        )
        assert np.isfinite(gnorm) and gnorm > 0

    @pytest.mark.slow
    def test_nspk_separation_heads(self):
        rng = np.random.RandomState(1)
        model = _tiny_fasnet(nspk=2)
        wav = jnp.asarray(rng.randn(1, 2, 4000).astype(np.float32) * 0.1)
        params = model.init(jax.random.PRNGKey(0), wav)
        out = model.apply(params, wav)
        assert out.shape == (1, 2, 4000)

    @pytest.mark.slow
    def test_num_mic_masking(self):
        """num_mic == nmic must equal the fixed-geometry (None) path; fewer
        valid mics must change the output (reference valid-channel
        semantics, FaSNet.py:607-612)."""
        rng = np.random.RandomState(2)
        model = _tiny_fasnet()
        wav = jnp.asarray(rng.randn(2, 3, 4000).astype(np.float32) * 0.1)
        params = model.init(jax.random.PRNGKey(0), wav)
        full = np.asarray(model.apply(params, wav, jnp.asarray([3, 3])))
        fixed = np.asarray(model.apply(params, wav))
        np.testing.assert_allclose(full, fixed, rtol=1e-4, atol=1e-5)
        partial = np.asarray(model.apply(params, wav, jnp.asarray([2, 3])))
        assert not np.allclose(partial[0], fixed[0], atol=1e-6)
        np.testing.assert_allclose(partial[1], fixed[1], rtol=1e-4,
                                   atol=1e-5)

    @pytest.mark.slow  # ~46 s cold (SETask train+enhance compile);
    # FaSNet coverage stays via the sliding-primitive + origin tests
    def test_se_task_integration(self):
        from speechlid_tpu.tasks.se import SETask

        rng = np.random.RandomState(3)
        task = SETask(enc_dim=16, hidden=24, n_blocks=1, chunk=10,
                      model_type="fasnet_tac")
        batch = {
            "noisy": rng.randn(2, 4000).astype(np.float32) * 0.1,
            "clean": rng.randn(2, 4000).astype(np.float32) * 0.1,
        }
        variables = task.init_variables(jax.random.PRNGKey(0), batch)
        loss, metrics, _ = task.train_loop(variables, batch, rngs=None)
        assert np.isfinite(float(loss))
        enhance = task.make_enhance_fn(variables)
        out = enhance(batch["noisy"][0])
        assert out.shape == (4000,)


class TestSELDNet:
    @pytest.mark.parametrize("builder,chans", [
        pytest.param(seldnet_vanilla, 8, marks=pytest.mark.slow),  # ~21 s
        pytest.param(seldnet_augmented, 4, marks=pytest.mark.slow),  # ~28 s
        # SELDNet keeps test_train_mode_mutates_batch_stats (~9 s) default
    ])
    def test_presets(self, builder, chans):
        rng = np.random.RandomState(0)
        spec = jnp.asarray(
            rng.randn(2, chans, 256, 64).astype(np.float32)
        )
        model = builder()
        variables = model.init(jax.random.PRNGKey(0), spec)
        sed, doa = model.apply(variables, spec)
        # freq 256 pooled to 1 per preset; time 64 pooled 2·2·2(·1) → 8
        assert sed.shape == (2, 8, 42)
        assert doa.shape == (2, 8, 126)
        assert float(jnp.min(sed)) >= 0.0 and float(jnp.max(sed)) <= 1.0
        assert float(jnp.min(doa)) >= -1.0 and float(jnp.max(doa)) <= 1.0

    def test_train_mode_mutates_batch_stats(self):
        rng = np.random.RandomState(1)
        spec = jnp.asarray(rng.randn(2, 8, 256, 32).astype(np.float32))
        model = seldnet_vanilla()
        variables = model.init(jax.random.PRNGKey(0), spec)
        (sed, _), mutated = model.apply(
            variables, spec, False, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert "batch_stats" in mutated
        assert sed.shape[0] == 2


class TestFaSNetOrigin:
    def _tiny(self, **kw):
        from speechlid_tpu.models.fasnet import FaSNetOrigin

        conf = dict(enc_dim=16, feature_dim=16, hidden_dim=24, n_layers=1,
                    segment_size=10, nspk=1)
        conf.update(kw)
        return FaSNetOrigin(**conf)

    @pytest.mark.slow
    def test_forward_and_grad(self):
        rng = np.random.RandomState(0)
        model = self._tiny()
        wav = jnp.asarray(rng.randn(1, 3, 2000).astype(np.float32) * 0.1)
        params = model.init(jax.random.PRNGKey(0), wav)
        out = jax.jit(model.apply)(params, wav)
        assert out.shape == (1, 1, 2000)
        assert np.isfinite(np.asarray(out)).all()

        g = jax.grad(lambda p: jnp.mean(model.apply(p, wav) ** 2))(params)
        gn = sum(float(jnp.sum(x**2)) for x in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gn) and gn > 0

    def test_shared_encoder_params(self):
        """Both stages share one waveform encoder + gLN (reference
        FaSNet.py:367-369 — self.encoder/enc_LN used in stage 1 and 2)."""
        rng = np.random.RandomState(1)
        model = self._tiny()
        wav = jnp.asarray(rng.randn(1, 2, 2000).astype(np.float32) * 0.1)
        params = model.init(jax.random.PRNGKey(0), wav)["params"]
        assert "encoder" in params and "enc_norm" in params
        assert "ref_bf" in params and "other_bf" in params

    @pytest.mark.slow
    def test_num_mic_masking(self):
        rng = np.random.RandomState(2)
        model = self._tiny()
        wav = jnp.asarray(rng.randn(2, 3, 2000).astype(np.float32) * 0.1)
        params = model.init(jax.random.PRNGKey(0), wav)
        fixed = np.asarray(model.apply(params, wav))
        full = np.asarray(model.apply(params, wav, jnp.asarray([3, 3])))
        np.testing.assert_allclose(full, fixed, rtol=1e-4, atol=1e-5)
        part = np.asarray(model.apply(params, wav, jnp.asarray([2, 3])))
        assert not np.allclose(part[0], fixed[0], atol=1e-6)

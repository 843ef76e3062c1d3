"""Model layer tests: shapes, length arithmetic, masking behavior, jit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechlid_tpu.models.conformer import (
    ConformerBlock,
    ConformerModel,
    Conv1dSubSampling2,
    Conv2dSubsampling,
    FBankLayer,
)
from speechlid_tpu.models.pooling import (
    ASTP,
    MHASTP,
    MQMHASTP,
    TAP,
    TSTP,
    pooling_out_dim,
)
from speechlid_tpu.models.resnet import ResNet18, ResNet34
from speechlid_tpu.models.xvector import XVEC


def _keys():
    k = jax.random.PRNGKey(0)
    return {"params": k, "dropout": k, "specaug": k, "stochastic_depth": k}


class TestConformer:
    def test_block_shape(self):
        m = ConformerBlock(dim=144, heads=4)
        x = jnp.zeros((2, 50, 144))
        params = m.init(_keys(), x)
        y = m.apply(params, x)
        assert y.shape == (2, 50, 144)

    @pytest.mark.slow  # ~25 s cold (two full-model compiles);
    # test_block_shape + padding_invariance keep the default coverage
    def test_model_subsampling_2_and_4(self):
        for sub, t_out in [(2, 51), (4, 24)]:
            m = ConformerModel(n_blocks=2, encoder_dim=64, heads=2, dim_head=32,
                               sub_sampling=sub)
            x = jnp.zeros((2, 101, 80))
            lengths = jnp.asarray([101, 60])
            params = m.init(_keys(), x, lengths)
            y = m.apply(params, x, lengths)
            assert y.shape[0] == 2 and y.shape[2] == 64
            assert y.shape[1] == t_out
            # length arithmetic matches reference formulas
            sl = np.asarray(m.subsampled_lengths(lengths))
            if sub == 2:
                np.testing.assert_array_equal(sl, [(101 - 1) // 2 + 1, (60 - 1) // 2 + 1])
            else:
                np.testing.assert_array_equal(
                    sl, [((101 - 1) // 2 - 1) // 2, ((60 - 1) // 2 - 1) // 2]
                )

    def test_padding_invariance_with_mask(self):
        """Valid-frame outputs must not depend on padded frame content.
        (Holds for attention via masking; conv/BN stay local in eval mode —
        allow tolerance for the depthwise conv boundary frames.)"""
        m = ConformerModel(n_blocks=1, encoder_dim=32, heads=2, dim_head=16,
                           sub_sampling=2, use_stochastic_depth=False)
        rng = np.random.RandomState(0)
        x1 = rng.randn(1, 101, 80).astype(np.float32)
        x2 = x1.copy()
        x2[:, 60:, :] = 99.0  # garbage in padding
        lengths = jnp.asarray([60])
        params = m.init(_keys(), jnp.asarray(x1), lengths)
        y1 = np.asarray(m.apply(params, jnp.asarray(x1), lengths))
        y2 = np.asarray(m.apply(params, jnp.asarray(x2), lengths))
        valid = (60 - 1) // 2 + 1
        # interior frames (depthwise conv k31 'same' halo = 15 frames)
        interior = valid - 16
        np.testing.assert_allclose(
            y1[:, :interior], y2[:, :interior], rtol=1e-4, atol=1e-4
        )

    def test_conv_barrier_parity(self):
        """`conv_barrier` must be numerically a no-op: it only inserts
        `lax.optimization_barrier` fences around the depthwise conv to stop
        the axon-TPU backend from fusing a bf16 grouped conv with its
        elementwise neighbors (a compile-hang, bisected in
        docs/runs/bf16_convmod_bisect.py)."""
        from speechlid_tpu.models.conformer import ConformerConvModule

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 50, 64), jnp.float32)
        base = ConformerConvModule(dim=64, conv_barrier=False)
        params = base.init(_keys(), x)
        ref = np.asarray(base.apply(params, x))
        fenced = ConformerConvModule(dim=64, conv_barrier=True)
        np.testing.assert_array_equal(np.asarray(fenced.apply(params, x)), ref)
        # bf16 auto-default turns the barrier on; explicit off must match it
        for flag in (None, True, False):
            m = ConformerConvModule(dim=64, dtype=jnp.bfloat16,
                                    conv_barrier=flag)
            out = np.asarray(m.apply(params, x.astype(jnp.bfloat16)))
            if flag is None:
                auto = out
            else:
                np.testing.assert_array_equal(out, auto)

    def test_stochastic_depth_changes_with_key(self):
        m = ConformerModel(n_blocks=4, encoder_dim=32, heads=2, dim_head=16,
                           stochastic_depth_p=0.3)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 41, 80), jnp.float32)
        params = m.init(_keys(), x)
        outs = []
        for seed in range(3):
            k = jax.random.PRNGKey(seed)
            y = m.apply(
                params, x, deterministic=False,
                rngs={"dropout": k, "stochastic_depth": k},
                mutable=["batch_stats"],
            )[0]
            outs.append(np.asarray(y))
        assert not np.allclose(outs[0], outs[1])

    def test_fbank_layer(self):
        m = FBankLayer()
        wav = jnp.asarray(np.random.RandomState(0).randn(2, 16000), jnp.float32)
        params = m.init(_keys(), wav)
        feats, f_len = m.apply(params, wav)
        assert feats.shape == (2, 101, 80)
        assert f_len is None  # no lengths given
        # training mode applies specaug → some zeros
        feats_tr, _ = m.apply(params, wav, deterministic=False,
                              rngs={"specaug": jax.random.PRNGKey(1)})
        assert (np.asarray(feats_tr) == 0).any()

    def test_fbank_layer_time_stretch(self):
        """t_stretch=True rescales frame lengths by the drawn rate and keeps
        static shapes (reference TimeStretch, audio_processor.py:220-222)."""
        m = FBankLayer(t_stretch=True, mask_times=0)
        wav = jnp.asarray(np.random.RandomState(0).randn(2, 16000), jnp.float32)
        lengths = jnp.asarray([16000, 12000], jnp.int32)
        params = m.init(_keys(), wav, lengths)
        feats, f_len = m.apply(params, wav, lengths)
        assert feats.shape == (2, 101, 80)
        np.testing.assert_array_equal(np.asarray(f_len), [101, 76])
        seen = set()
        for i in range(8):
            feats_tr, f_tr = m.apply(
                params, wav, lengths, deterministic=False,
                rngs={"specaug": jax.random.PRNGKey(i)},
            )
            assert feats_tr.shape == (2, 101, 80)  # static width
            seen.add(int(np.asarray(f_tr)[0]))
        # rates {0.9, 1.0, 1.1} → lengths {ceil(101/.9)→101 (clipped),
        # 101, ceil(101/1.1)=92}; at least two distinct outcomes in 8 draws
        assert len(seen) >= 2 and min(seen) <= 92


class TestPooling:
    @pytest.mark.parametrize("cls,kw", [
        (TAP, {}), (TSTP, {}), (ASTP, {}),
        (MHASTP, {"head_num": 2}), (MQMHASTP, {"head_num": 8}),
    ])
    def test_shapes_and_masking(self, cls, kw):
        m = cls(**kw)
        rng = np.random.RandomState(0)
        x = rng.randn(2, 30, 64).astype(np.float32)
        mask = np.zeros((2, 30), bool)
        mask[0, :30] = True
        mask[1, :20] = True
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
        out = m.apply(params, jnp.asarray(x), jnp.asarray(mask))
        expected = pooling_out_dim(type(m).__name__, 64)
        assert out.shape == (2, expected)
        # masked stats must equal stats of the truncated sequence
        out_trunc = m.apply(params, jnp.asarray(x[1:, :20]), None)
        np.testing.assert_allclose(
            np.asarray(out)[1], np.asarray(out_trunc)[0], rtol=1e-4, atol=1e-5
        )

    def test_tstp_values(self):
        x = np.asarray([[[1.0, 2.0], [3.0, 4.0]]], np.float32)  # (1, T=2, F=2)
        m = TSTP()
        out = np.asarray(m.apply(m.init(jax.random.PRNGKey(0), jnp.asarray(x)),
                                 jnp.asarray(x)))
        np.testing.assert_allclose(out[0, :2], [2.0, 3.0], atol=1e-6)
        np.testing.assert_allclose(out[0, 2:], [1.0, 1.0], atol=1e-3)


class TestXVEC:
    def test_shapes_and_lengths(self):
        m = XVEC(feat_dim=80, embed_dim=512)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 200, 80), jnp.float32)
        lengths = jnp.asarray([200, 150])
        params = m.init(jax.random.PRNGKey(0), x, lengths)
        ea, eb = m.apply(params, x, lengths)
        assert ea.shape == (2, 512) and eb.shape == (2, 512)
        # receptive field: 200 - 4 - 4 - 6 = 186
        np.testing.assert_array_equal(np.asarray(m.out_lengths(lengths)), [186, 136])

    def test_train_mode_updates_batch_stats(self):
        m = XVEC(feat_dim=24, hid_dim=32, stats_dim=48, embed_dim=16)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 50, 24), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x, train=True)
        (_, _), new_state = m.apply(params, x, train=True, mutable=["batch_stats"])
        old = jax.tree_util.tree_leaves(params["batch_stats"])
        new = jax.tree_util.tree_leaves(new_state["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(old, new))


class TestResNet:
    @pytest.mark.slow  # ~24 s cold; resnet34_jit is the fast default rep
    def test_resnet18_shapes(self):
        m = ResNet18(feat_dim=80, embed_dim=128)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 80), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        ea, eb = m.apply(params, x)
        assert ea.shape == (2, 128) and eb.shape == (2, 128)

    def test_resnet34_jit(self):
        m = ResNet34(feat_dim=40, embed_dim=64)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 48, 40), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        apply = jax.jit(lambda p, x: m.apply(p, x))
        ea, eb = apply(params, x)
        assert eb.shape == (1, 64)


class TestConformerScanBlocks:
    KW = dict(n_blocks=3, encoder_dim=32, heads=2, dim_head=16,
              sub_sampling=4, use_stochastic_depth=False)

    @staticmethod
    def _restack(v0, n):
        """Unrolled block_i params → the nn.scan stacked layout."""
        import jax.tree_util as jtu

        out = {"params": {
            k: v for k, v in v0["params"].items() if not k.startswith("block_")
        }}
        out["params"]["blocks"] = {"ConformerBlock_0": jtu.tree_map(
            lambda *ls: jnp.stack(ls),
            *[v0["params"][f"block_{i}"] for i in range(n)],
        )}
        if "batch_stats" in v0:
            out["batch_stats"] = {"blocks": {"ConformerBlock_0": jtu.tree_map(
                lambda *ls: jnp.stack(ls),
                *[v0["batch_stats"][f"block_{i}"] for i in range(n)],
            )}}
        return out

    def test_parity_with_unrolled(self):
        """scan_blocks only changes the param layout (stacked layer axis),
        never the numbers: applying the unrolled model's weights restacked
        must reproduce its output."""
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 101, 80), jnp.float32)
        lens = jnp.asarray([101, 80])
        m0 = ConformerModel(**self.KW)
        v0 = m0.init(_keys(), x, lens)
        y0 = np.asarray(m0.apply(v0, x, lens))
        m1 = ConformerModel(**self.KW, scan_blocks=True)
        v1 = self._restack(v0, self.KW["n_blocks"])
        y1 = np.asarray(m1.apply(v1, x, lens))
        np.testing.assert_allclose(y1, y0, rtol=2e-5, atol=2e-5)

    @pytest.mark.slow  # ~30 s cold (scan fwd+bwd compile);
    # test_parity_with_unrolled keeps the default scan coverage
    def test_train_mode_grads_and_mutation(self):
        """Training path under scan: stochastic depth rng splits per layer,
        BatchNorm stats mutate, grads flow to every stacked layer."""
        kw = dict(self.KW, use_stochastic_depth=True, stochastic_depth_p=0.8)
        m = ConformerModel(**kw, scan_blocks=True)
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 101, 80), jnp.float32)
        lens = jnp.asarray([101, 101])
        v = m.init(_keys(), x, lens)

        def loss(p):
            y, mut = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x, lens,
                deterministic=False, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1),
                      "stochastic_depth": jax.random.PRNGKey(2)},
            )
            return jnp.mean(y ** 2)

        g = jax.jit(jax.grad(loss))(v["params"])
        gb = g["blocks"]["ConformerBlock_0"]
        leaves = jax.tree_util.tree_leaves(gb)
        assert leaves and all(l.shape[0] == 3 for l in leaves)
        # every stacked layer received gradient signal
        per_layer = sum(jnp.sum(jnp.abs(l), axis=tuple(range(1, l.ndim)))
                        for l in leaves)
        assert np.all(np.asarray(per_layer) > 0)

    @pytest.mark.slow  # ~17 s cold
    def test_remat_composes(self):
        m = ConformerModel(**self.KW, scan_blocks=True, remat=True)
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 41, 80), jnp.float32)
        v = m.init(_keys(), x, jnp.asarray([41]))
        y = m.apply(v, x, jnp.asarray([41]))
        assert np.isfinite(np.asarray(y)).all()


class TestConformerRemat:
    @pytest.mark.slow
    def test_remat_parity_fwd_and_grad(self):
        """remat=True must be numerically identical (it only changes the
        backward-pass schedule) — the stable axon-TPU train config."""
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 50, 80).astype(np.float32))
        lengths = jnp.asarray([50, 30], jnp.int32)
        m0 = ConformerModel(n_blocks=2, encoder_dim=32, heads=2,
                            dim_head=16, sub_sampling=4)
        m1 = ConformerModel(n_blocks=2, encoder_dim=32, heads=2,
                            dim_head=16, sub_sampling=4, remat=True)
        params = m0.init(_keys(), x, lengths)
        np.testing.assert_allclose(
            np.asarray(m0.apply(params, x, lengths)),
            np.asarray(m1.apply(params, x, lengths)),
            rtol=1e-6, atol=1e-6,
        )
        g0 = jax.grad(lambda p: jnp.sum(m0.apply(p, x, lengths) ** 2))(params)
        g1 = jax.grad(lambda p: jnp.sum(m1.apply(p, x, lengths) ** 2))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestMaskedBatchNorm:
    def test_train_stats_ignore_padding(self):
        """Training-mode BN batch statistics must come from valid frames
        only: garbage in the padded tail cannot change valid outputs."""
        from speechlid_tpu.models.conformer import ConformerConvModule

        rng = np.random.RandomState(0)
        x1 = rng.randn(2, 40, 32).astype(np.float32)
        x2 = x1.copy()
        x2[:, 25:, :] = 50.0  # garbage padding
        mask = jnp.arange(40)[None, :] < 25
        mask = jnp.broadcast_to(mask, (2, 40))
        m = ConformerConvModule(dim=32, conv_barrier=False)
        v = m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x1))
        def run(x):
            y, mut = m.apply(
                v, jnp.asarray(x), deterministic=False, pad_mask=mask,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            return np.asarray(y), mut["batch_stats"]
        y1, bs1 = run(x1)
        y2, bs2 = run(x2)
        # conv halo reaches 15 frames past the boundary; interior equal
        np.testing.assert_allclose(y1[:, :10], y2[:, :10], rtol=1e-4,
                                   atol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(bs1),
                        jax.tree_util.tree_leaves(bs2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_running_stats_match_torch_one_step(self):
        """One train-mode update must land exactly on torch BatchNorm1d's
        running stats (reference conformer.py:197 uses torch defaults:
        momentum 0.1, unbiased running_var) — and the normalized output
        must match torch's (biased batch var)."""
        import torch

        from speechlid_tpu.models.conformer import _MaskedBatchNorm

        x = np.random.RandomState(3).randn(4, 20, 16).astype(np.float32)
        mod = _MaskedBatchNorm(use_running_average=False)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y, mut = mod.apply(v, jnp.asarray(x), mutable=["batch_stats"])

        tb = torch.nn.BatchNorm1d(16)  # torch defaults
        with torch.no_grad():
            ty = tb(torch.from_numpy(x.copy()).transpose(1, 2))
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["mean"]),
            tb.running_mean.numpy(), rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["var"]),
            tb.running_var.numpy(), rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(y), ty.transpose(1, 2).numpy(), rtol=1e-4, atol=1e-5,
        )

    def test_eval_matches_flax_batchnorm_defaults(self):
        """Fresh-init eval behavior equals flax nn.BatchNorm (mean 0,
        var 1, same eps/affine) — checkpoint interchangeability."""
        import flax.linen as fnn

        from speechlid_tpu.models.conformer import _MaskedBatchNorm

        x = jnp.asarray(np.random.RandomState(1).randn(2, 9, 16), jnp.float32)
        ours = _MaskedBatchNorm(use_running_average=True)
        ref = fnn.BatchNorm(use_running_average=True)
        vo = ours.init(jax.random.PRNGKey(0), x)
        vr = ref.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(vo)
                == jax.tree_util.tree_structure(vr))
        np.testing.assert_allclose(
            np.asarray(ours.apply(vo, x)), np.asarray(ref.apply(vr, x)),
            rtol=1e-5, atol=1e-6,
        )

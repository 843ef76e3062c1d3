"""WavLM numerical parity vs the reference torch implementation.

The reference's vendored torch WavLM (lid/wavlm/) imports cleanly on CPU, so
the strongest fidelity check is direct: random-init the torch model, convert
its state dict with our converter, run both on the same audio, compare.
(SURVEY.md §7.3.3 "WavLM fidelity" gate.)
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from speechlid_tpu.models.wavlm import (  # noqa: E402
    WavLM,
    WavLMConfig,
    compute_mask_spans,
    conv_out_lengths,
    convert_wavlm_state,
)

SMALL_CFG = dict(
    encoder_layers=2,
    encoder_embed_dim=64,
    encoder_ffn_embed_dim=128,
    encoder_attention_heads=4,
    conv_feature_layers="[(32,10,5)] + [(32,3,2)] * 2",
    dropout=0.0,
    attention_dropout=0.0,
    encoder_layerdrop=0.0,
)


def _make_pair(extra: dict):
    """Random-init reference torch model + converted flax params."""
    import lid.wavlm.WavLM as RW

    cfg_dict = dict(SMALL_CFG, **extra)
    torch.manual_seed(0)
    ref = RW.WavLM(RW.WavLMConfig(dict(cfg_dict)))
    ref.eval()
    cfg = WavLMConfig.from_dict(cfg_dict)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_wavlm_state(state, cfg)
    model = WavLM(cfg)
    return ref, model, params


@pytest.mark.parametrize(
    "extra",
    [
        {},  # plain transformer, no rel-pos
        {"relative_position_embedding": True, "num_buckets": 32,
         "max_distance": 128},
        {"relative_position_embedding": True, "gru_rel_pos": True,
         "num_buckets": 32, "max_distance": 128},  # WavLM-Base+ recipe
        {"layer_norm_first": True},
    ],
)
def test_forward_parity(extra):
    ref, model, params = _make_pair(extra)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3200).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_out, _ = ref.extract_features(torch.from_numpy(x))
    got, _ = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), ref_out.numpy(), rtol=1e-3, atol=2e-4
    )


def test_layer_results_parity():
    ref, model, params = _make_pair(
        {"relative_position_embedding": True, "gru_rel_pos": True,
         "num_buckets": 32, "max_distance": 128}
    )
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4800).astype(np.float32) * 0.1
    with torch.no_grad():
        (feat, res), _ = ref.extract_features(
            torch.from_numpy(x), output_layer=2, ret_layer_results=True
        )
    got, _, layers = model.apply(
        {"params": params}, jnp.asarray(x), ret_layer_results=True
    )
    # reference collects [input, after layer 1, after layer 2], (T, B, C) each
    ref_layers = [t[0].transpose(0, 1).numpy() for t in res]
    assert len(layers) == len(ref_layers)
    for mine, theirs in zip(layers, ref_layers):
        np.testing.assert_allclose(
            np.asarray(mine), theirs, rtol=1e-3, atol=2e-4
        )


def test_padding_mask_lengths():
    _, model, params = _make_pair({})
    cfg = model.config
    lengths = jnp.asarray([3200, 1600])
    expected = np.asarray(conv_out_lengths(lengths, cfg.conv_layers))
    # conv arithmetic: ((T-10)//5+1 then (T-3)//2+1 twice)
    def ref_len(t):
        for k, s in [(10, 5), (3, 2), (3, 2)]:
            t = (t - k) // s + 1
        return t
    np.testing.assert_array_equal(expected, [ref_len(3200), ref_len(1600)])

    # zero-padded batch parity: the reference encoder ignores the padding
    # mask entirely in this call path (WavLM.py:392-393), so outputs must
    # match a plain forward on the zero-padded waveform
    ref_t, _, _ = _make_pair({})
    x = np.random.RandomState(0).randn(2, 3200).astype(np.float32) * 0.1
    x[1, 1600:] = 0.0
    with torch.no_grad():
        ref_out, _ = ref_t.extract_features(torch.from_numpy(x))
    out, feat_len = model.apply(
        {"params": params}, jnp.asarray(x), lengths=lengths
    )
    np.testing.assert_array_equal(np.asarray(feat_len), expected)
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy(), rtol=1e-3, atol=2e-4
    )

    # mask_attention=True changes the padded utterance (pad keys excluded)
    # but leaves the full-length one identical.  NOTE: full garbage-padding
    # invariance is impossible in this architecture — the first conv's
    # GroupNorm normalizes over all time incl. padding (reference quirk).
    from speechlid_tpu.models.wavlm import WavLM as _W

    masked_model = _W(model.config, mask_attention=True)
    g1, _ = masked_model.apply(
        {"params": params}, jnp.asarray(x), lengths=lengths
    )
    assert not np.allclose(np.asarray(g1[1]), np.asarray(out[1]))
    np.testing.assert_allclose(
        np.asarray(g1[0]), np.asarray(out[0]), rtol=1e-4, atol=1e-5
    )


class TestMasking:
    def test_span_mask_statistics(self):
        key = jax.random.PRNGKey(0)
        mask = compute_mask_spans(key, 64, 200, mask_prob=0.65, mask_length=10)
        frac = np.asarray(mask).mean()
        # reference masks ≈ prob of frames (with overlap shrinkage); loose band
        assert 0.3 < frac < 0.7
        assert mask.shape == (64, 200)

    def test_mask_respects_lengths(self):
        key = jax.random.PRNGKey(1)
        lengths = jnp.asarray([200, 50])
        mask = compute_mask_spans(
            key, 2, 200, 0.65, 10, lengths=lengths
        )
        assert not np.asarray(mask)[1, 50:].any()

    def test_masked_forward_uses_mask_emb(self):
        _, model, params = _make_pair({})
        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 3200).astype(np.float32)
        )
        a, _ = model.apply(
            {"params": params}, x, mask=True, deterministic=False,
            rngs={"mask": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(0)},
        )
        b, _ = model.apply({"params": params}, x)
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestScanLayers:
    """scan_layers=True (nn.scan over layers 1..N-1; layer 0 unrolled with
    the shared rel-attn bias table) is a param-LAYOUT change only."""

    CFG = dict(
        encoder_layers=4, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
        encoder_attention_heads=4, relative_position_embedding=True,
        num_buckets=32, max_distance=64, gru_rel_pos=True,
        conv_feature_layers="[(32,10,5)] + [(32,3,2)] * 2", dropout=0.0,
    )

    def _models(self):
        from speechlid_tpu.models.wavlm import WavLMConfig, WavLMModel

        cfg = WavLMConfig.from_dict(dict(self.CFG))
        return WavLMModel(cfg), WavLMModel(cfg, scan_layers=True)

    def test_parity_all_layers(self):
        from speechlid_tpu.models.wavlm import stack_scan_layers

        m0, m1 = self._models()
        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 6400) * 0.1, jnp.float32)
        lens = jnp.asarray([6400, 4800])
        v0 = m0.init({"params": jax.random.PRNGKey(0)}, x, lens)
        y0 = np.asarray(m0.apply(v0, x, lens, only_last=False))
        p1 = {"wavlm": stack_scan_layers(v0["params"]["wavlm"])}
        y1 = np.asarray(m1.apply({"params": p1}, x, lens, only_last=False))
        assert y0.shape == y1.shape == (5, 2, 319, 64)
        np.testing.assert_allclose(y1, y0, rtol=2e-5, atol=2e-5)

    def test_parity_unrolled_scan_body(self):
        """scan_unroll>1 (k body copies per loop iteration — the fusion /
        compile-size middle ground for the round-3 scan runtime gap) is
        numerics-identical, including a non-divisible unroll (3 scanned
        layers, unroll 2)."""
        from speechlid_tpu.models.wavlm import (WavLMConfig, WavLMModel,
                                                stack_scan_layers)

        cfg = WavLMConfig.from_dict(dict(self.CFG))
        m0 = WavLMModel(cfg)
        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 6400) * 0.1, jnp.float32)
        lens = jnp.asarray([6400, 4800])
        v0 = m0.init({"params": jax.random.PRNGKey(0)}, x, lens)
        y0 = np.asarray(m0.apply(v0, x, lens, only_last=False))
        p1 = {"wavlm": stack_scan_layers(v0["params"]["wavlm"])}
        for unroll in (2, 3, 11):  # 11 > N-1 clamps to full unroll
            m1 = WavLMModel(cfg, scan_layers=True, scan_unroll=unroll)
            y1 = np.asarray(
                m1.apply({"params": p1}, x, lens, only_last=False))
            np.testing.assert_allclose(y1, y0, rtol=2e-5, atol=2e-5)

    @pytest.mark.slow  # ~32 s cold (scan bwd compile); the scan parity
    # tests keep the default coverage
    def test_train_mode_grads_all_layers(self):
        """Masking + dropout rngs + grads through the scanned stack."""
        _, m1 = self._models()
        x = jnp.asarray(
            np.random.RandomState(1).randn(2, 6400) * 0.1, jnp.float32)
        lens = jnp.asarray([6400, 6400])
        rngs = {"params": jax.random.PRNGKey(0),
                "mask": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2),
                "layerdrop": jax.random.PRNGKey(3)}
        v = m1.init(rngs, x, lens)

        def loss(p):
            y = m1.apply({"params": p}, x, lens, deterministic=False,
                         rngs={k: v_ for k, v_ in rngs.items()
                               if k != "params"})
            return jnp.mean(y ** 2)

        g = jax.jit(jax.grad(loss))(v["params"])
        stacked = g["wavlm"]["layers_rest"]["WavLMEncoderLayer_0"]
        leaves = jax.tree_util.tree_leaves(stacked)
        assert leaves and all(l.shape[0] == 3 for l in leaves)
        per_layer = sum(jnp.sum(jnp.abs(l), axis=tuple(range(1, l.ndim)))
                        for l in leaves)
        assert np.all(np.asarray(per_layer) > 0)

"""Tests for stacked per-language heads, discriminator scoring, classifiers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechlid_tpu.models.classifier import LidClassifier
from speechlid_tpu.models.conformer import ConformerModel
from speechlid_tpu.models.multilang import (
    MultiLangHeadStack,
    MutiLangModel,
    LangDiscriminatorMLP,
    lang_confidence_scores,
)


def _keys():
    k = jax.random.PRNGKey(0)
    return {"params": k, "dropout": k, "stochastic_depth": k}


VOCABS = (10, 25, 7)  # three languages, uneven vocab sizes


class TestHeadStack:
    @pytest.mark.parametrize("head_type", [
        pytest.param("conformer_linear", marks=pytest.mark.slow),  # ~25 s
        "bilstm",  # fast default-gate head-stack representative (~11 s)
    ])
    def test_all_languages_one_graph(self, head_type):
        m = MultiLangHeadStack(
            vocab_sizes=VOCABS, head_type=head_type, linear_dim=32,
            dim_head=8, num_head=4,
        )
        x = jnp.asarray(np.random.RandomState(0).randn(2, 20, 32), jnp.float32)
        lengths = jnp.asarray([20, 15])
        params = m.init(_keys(), x, lengths)
        logits = m.apply(params, x, lengths)
        assert logits.shape == (3, 2, 20, 26)  # (L, B, T, Vmax+1)
        # invalid vocab slots masked to -inf for smaller-vocab languages
        lp = np.asarray(logits)
        assert np.all(lp[0, :, :, 10:25] < -1e30)  # lang0 pad ids
        assert np.isfinite(lp[0, :, :, 25]).all()  # blank always valid
        assert np.isfinite(lp[1, :, :, :25]).all()  # lang1 full vocab

    def test_heads_differ_across_languages(self):
        m = MultiLangHeadStack(vocab_sizes=VOCABS, linear_dim=32,
                               dim_head=8, num_head=4)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 10, 32), jnp.float32)
        params = m.init(_keys(), x, None)
        logits = np.asarray(m.apply(params, x, None))
        assert not np.allclose(logits[0, :, :, :7], logits[2, :, :, :7])


class TestConfidenceScores:
    def test_formula(self):
        # hand-built logits: lang 0 confident non-blank, lang 1 all blank
        L, B, T, V = 2, 1, 4, 6  # blank index 5
        logits = np.full((L, B, T, V), -10.0, np.float32)
        logits[0, 0, :, 1] = 5.0  # lang0: argmax id 1 each frame
        logits[1, 0, :, 5] = 5.0  # lang1: argmax blank
        vocabs = jnp.asarray([5, 5])
        scores = np.asarray(lang_confidence_scores(jnp.asarray(logits), vocabs))
        # lang0: mean max-logprob / ln(5); near 0 (confident → logprob ~0)
        lp = jax.nn.log_softmax(jnp.asarray(logits[0, 0, 0]))
        expected0 = float(4 * lp.max() / (4 * np.log(5) + 1e-5))
        np.testing.assert_allclose(scores[0, 0], expected0, rtol=1e-5)
        # lang1: no non-blank frames → zero-evidence floor, strictly below
        # any achievable mean (see lang_confidence_scores docstring) — NOT
        # the eps-guarded 0.0 which would outrank every confident head
        np.testing.assert_allclose(scores[0, 1], -2.0)
        assert scores[0, 1] < scores[0, 0]

    def test_all_blank_floor_corrected(self):
        L, B, T, V = 2, 1, 4, 6
        logits = np.full((L, B, T, V), -10.0, np.float32)
        logits[0, 0, :, 1] = 5.0
        logits[1, 0, :, 5] = 5.0  # all blank
        vocabs = jnp.asarray([5, 5])
        s = np.asarray(
            lang_confidence_scores(jnp.asarray(logits), vocabs, corrected=True)
        )
        assert s[0, 1] == 0.0  # conf floored to 0 → quadratic fixed point
        assert s[0, 1] < s[0, 0]

    def test_corrected_variant_monotone(self):
        rng = np.random.RandomState(0)
        logits = jnp.asarray(rng.randn(3, 4, 10, 26).astype(np.float32))
        vocabs = jnp.asarray([10, 25, 7])
        s = np.asarray(lang_confidence_scores(logits, vocabs, corrected=True))
        assert s.shape == (4, 3)
        assert np.isfinite(s).all()

    def test_length_masking(self):
        rng = np.random.RandomState(0)
        logits = jnp.asarray(rng.randn(2, 2, 10, 11).astype(np.float32))
        vocabs = jnp.asarray([10, 10])
        full = np.asarray(lang_confidence_scores(logits, vocabs))
        lens = jnp.asarray([10, 5])
        masked = np.asarray(lang_confidence_scores(logits, vocabs, lens))
        np.testing.assert_allclose(full[0], masked[0], rtol=1e-5)
        trunc = np.asarray(
            lang_confidence_scores(logits[:, 1:2, :5], vocabs)
        )
        np.testing.assert_allclose(masked[1], trunc[0], rtol=1e-5)


class TestMutiLangModel:
    @pytest.mark.slow  # ~36 s cold; the bilstm head-stack + confidence
    # tests keep MutiLangModel default coverage
    def test_end_to_end_with_conformer_featurizer(self):
        feat = ConformerModel(n_blocks=1, encoder_dim=32, heads=2, dim_head=16,
                              n_mels=80, use_stochastic_depth=False)
        m = MutiLangModel(featurizer=feat, vocab_sizes=VOCABS, linear_dim=32,
                          dim_head=8, num_head=4)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 101, 80), jnp.float32)
        lengths = jnp.asarray([101, 61])
        params = m.init(_keys(), x, lengths, method=MutiLangModel.infer)
        logits, feat_lens = m.apply(params, x, lengths)
        assert logits.shape[0] == 3 and logits.shape[-1] == 26
        np.testing.assert_array_equal(np.asarray(feat_lens), [51, 31])

        out = m.apply(params, x, lengths, method=MutiLangModel.infer)
        assert out["scores"].shape == (2, 3)
        assert out["mlp_scores"].shape == (2, 3)
        assert out["pred_lang"].shape == (2,)

    def test_discriminator_mlp_stops_gradient(self):
        m = LangDiscriminatorMLP(n_lang=3)
        s = jnp.asarray(np.random.RandomState(0).randn(2, 3), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), s)

        def loss(scores):
            return jnp.sum(m.apply(params, scores) ** 2)

        g = np.asarray(jax.grad(loss)(s))
        assert np.all(g == 0)  # input detached (reference .detach())


class TestLidClassifier:
    @pytest.mark.parametrize("backend", [
        "xvector", "linear",
        pytest.param("resnet2", marks=pytest.mark.slow),  # ~37 s cold
        "xvector2",
    ])
    def test_backends(self, backend):
        m = LidClassifier(backend=backend, num_classes=3, feat_dim=80)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 80), jnp.float32)
        lengths = jnp.asarray([64, 50])
        params = m.init(jax.random.PRNGKey(0), x, lengths)
        logits = m.apply(params, x, lengths)
        assert logits.shape == (2, 3)
        assert np.isfinite(np.asarray(logits)).all()

"""Numerical parity of our Conformer stack vs the ACTUAL reference torch
code (/root/reference/lid/conformer.py, lid/ConformerLangModel.py), weights
converted with convert_conformer_state / convert_supervised_lid_state.

This is the supervised-path analog of tests/test_wavlm.py's WavLM parity
gate (SURVEY.md §7.3 "Conformer encoder … parity tests vs reference
goldens") — random-init the torch model, convert, compare forwards.
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from speechlid_tpu.compat import install

install()
sys.path.insert(0, "/root/reference")

from lid.conformer import ConformerModel as TorchConformer  # noqa: E402
from lid.ConformerLangModel import (  # noqa: E402
    ConformerMutiLangModel as TorchMutiLang,
)

from speechlid_tpu.models.conformer import (  # noqa: E402
    ConformerModel,
    convert_conformer_state,
)
from speechlid_tpu.models.multilang import (  # noqa: E402
    MutiLangModel,
    convert_supervised_lid_state,
)

SMALL = dict(
    n_blocks=2, encoder_dim=32, dim_head=16, heads=2, n_mels=16, ff_mult=4,
    conv_expansion_factor=2, conv_kernel_size=31,
)


def _sd_numpy(model: torch.nn.Module):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


class TestConformerModelParity:
    @pytest.mark.parametrize("sub_sampling", [2, 4])
    def test_forward_matches_torch(self, sub_sampling):
        torch.manual_seed(0)
        tm = TorchConformer(
            **SMALL, sub_sampling=sub_sampling, use_stochastic_depth=False
        )
        tm.eval()
        jm = ConformerModel(
            **SMALL, sub_sampling=sub_sampling, use_stochastic_depth=False,
            pos_dropout=0.0,
        )
        variables = convert_conformer_state(
            _sd_numpy(tm), n_blocks=2, sub_sampling=sub_sampling
        )
        x = np.random.RandomState(1).randn(2, 50, 16).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()
        got = np.asarray(
            jm.apply(
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]},
                jnp.asarray(x), None, True,
            )
        )
        assert ref.shape == got.shape
        # ss=4's conv2d stacks accumulate a bit more float noise than ss=2
        np.testing.assert_allclose(ref, got, atol=1e-4, rtol=1e-4)

    def test_train_mode_bn_stats_match(self):
        """One training forward: batch-stat BN + running-stat update parity
        (dropout/stochastic depth off so randomness can't diverge)."""
        torch.manual_seed(0)
        tm = TorchConformer(**SMALL, sub_sampling=2, use_stochastic_depth=False)
        tm.train()
        tm.pos.dropout.p = 0.0
        jm = ConformerModel(
            **SMALL, sub_sampling=2, use_stochastic_depth=False,
            pos_dropout=0.0,
        )
        variables = convert_conformer_state(_sd_numpy(tm), 2, 2)
        x = np.random.RandomState(2).randn(2, 50, 16).astype(np.float32)
        ref = tm(torch.from_numpy(x)).detach().numpy()
        got, mut = jm.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), None, False,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        np.testing.assert_allclose(ref, np.asarray(got), atol=2e-5, rtol=1e-5)
        # running stats after one step
        t_bn = tm.encoders[0].conv.net[5]
        j_bn = mut["batch_stats"]["block_0"]["conv"]["bn"]
        np.testing.assert_allclose(
            t_bn.running_mean.numpy(), np.asarray(j_bn["mean"]), atol=1e-5
        )
        np.testing.assert_allclose(
            t_bn.running_var.numpy(), np.asarray(j_bn["var"]), atol=1e-5
        )


LANGS = ["fa", "sw", "vi"]
LANG2VOCAB = {"fa": 5, "sw": 7, "vi": 6}
LANG2INDEX = {"fa": 0, "sw": 1, "vi": 2}


def _make_pair():
    torch.manual_seed(0)
    tm = TorchMutiLang(
        num_layers=1,
        lang2vocab=LANG2VOCAB,
        lang2index=LANG2INDEX,
        hidden_dim=128,
        conformer_linear=True,
        dropout=0.0,
        linear_dim=32,
        n_blocks=2,
        n_mels=16,
        encoder_dim=32,
        dim_head=16,
        last_dim_head=16,
        heads=2,
        sub_sampling=2,
    )
    tm.eval()
    tm.model.featurizer.use_stochastic_depth = False
    feat = ConformerModel(
        **SMALL, sub_sampling=2, use_stochastic_depth=False, pos_dropout=0.0
    )
    jm = MutiLangModel(
        featurizer=feat,
        vocab_sizes=tuple(LANG2VOCAB[lg] for lg in LANGS),
        linear_dim=32,
        dim_head=16,
        num_head=8,
    )
    variables = convert_supervised_lid_state(
        _sd_numpy(tm), LANGS, LANG2VOCAB, n_blocks=2, sub_sampling=2
    )
    return tm, jm, variables


class TestSupervisedJointParity:
    def test_infer_matches_torch(self):
        tm, jm, variables = _make_pair()
        x = np.random.RandomState(3).randn(2, 60, 16).astype(np.float32)
        with torch.no_grad():
            res, (scores_t, mlp_t) = tm(torch.from_numpy(x), 16000, None)
        out = jm.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), None, method=MutiLangModel.infer,
        )
        logits = np.asarray(out["logits"])  # (L, B, T, vmax+1)
        vmax = max(LANG2VOCAB.values())
        for li, lg in enumerate(LANGS):
            v_l = LANG2VOCAB[lg]
            ref_l = res[lg].numpy()  # (B, T, v_l+1)
            np.testing.assert_allclose(
                ref_l[..., :v_l], logits[li][..., :v_l], atol=2e-5, rtol=1e-5
            )
            np.testing.assert_allclose(  # blank: reference V_l ↔ ours vmax
                ref_l[..., v_l], logits[li][..., vmax], atol=2e-5, rtol=1e-5
            )
        np.testing.assert_allclose(
            scores_t.numpy(), np.asarray(out["scores"]), atol=2e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            mlp_t.numpy(), np.asarray(out["mlp_scores"]), atol=2e-5, rtol=1e-5
        )
        # predicted language agrees
        assert np.array_equal(
            scores_t.numpy().argmax(-1), np.asarray(out["pred_lang"])
        )

    def test_ctc_loss_matches_torch(self):
        """CTC loss on converted logits: reference per-language
        CTCLoss(blank=V_l, zero_infinity) == ours with blank at vmax
        (the padded slots are -inf-masked, so the distributions agree)."""
        tm, jm, variables = _make_pair()
        rng = np.random.RandomState(4)
        x = rng.randn(2, 60, 16).astype(np.float32)
        lang = "sw"
        v_l = LANG2VOCAB[lang]
        texts = rng.randint(0, v_l, size=(2, 7)).astype(np.int64)

        with torch.no_grad():
            res, _ = tm(torch.from_numpy(x), 16000, lang)
        out_t = res[lang]  # (B, T', v_l+1)
        t_frames = out_t.shape[1]
        loss_fn = torch.nn.CTCLoss(blank=v_l, reduction="none",
                                   zero_infinity=True)
        ref_loss = loss_fn(
            torch.log_softmax(out_t, dim=-1).transpose(1, 0),
            torch.from_numpy(texts),
            torch.full((2,), t_frames, dtype=torch.long),
            torch.full((2,), 7, dtype=torch.long),
        ).mean()

        from speechlid_tpu.ops.ctc import ctc_loss

        out_j, _ = jm.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), None, True,
        )
        li = LANGS.index(lang)
        logits = out_j[li]  # (B, T', vmax+1), blank last
        got_loss = ctc_loss(
            jax.nn.log_softmax(logits, axis=-1),
            jnp.asarray(texts, jnp.int32),
            jnp.full((2,), t_frames, jnp.int32),
            jnp.full((2,), 7, jnp.int32),
            reduction="none",  # reference: CTCLoss(reduction='none').mean()
        ).mean()
        np.testing.assert_allclose(
            float(ref_loss), float(got_loss), atol=1e-4, rtol=1e-5
        )

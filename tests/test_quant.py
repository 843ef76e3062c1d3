"""int8 dynamic-quantized dot (ops/quant.py) — numerics and wiring.

The reference has no quantized path; these tests gate the beyond-parity
serving feature: quantization error bounds vs the exact dot, the batched
fallback's exactness, the straight-through backward, and nn.Dense
injection.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechlid_tpu.ops.quant import (
    int8_dot_general,
    int8_dot_general_ste,
    quant_dot_general,
)

DENSE_DN = (((1,), (0,)), ((), ()))


def test_int8_dense_dot_error_bound():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(128, 96).astype(np.float32) * 0.05)
    exact = x @ w
    q = int8_dot_general(x, w, DENSE_DN)
    # dynamic symmetric int8: relative error ~ 1/127 per operand row-scale
    rel = np.abs(np.asarray(q - exact)) / (np.abs(np.asarray(exact)) + 1.0)
    assert rel.max() < 0.08, rel.max()
    # correlation with the exact output stays essentially 1
    c = np.corrcoef(np.asarray(q).ravel(), np.asarray(exact).ravel())[0, 1]
    assert c > 0.999, c


def test_int8_dot_3d_lhs_and_dtype():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 16, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(32, 24).astype(np.float32))
    q = int8_dot_general(x, w, (((2,), (0,)), ((), ())))
    assert q.shape == (4, 16, 24)
    assert q.dtype == jnp.float32
    qb = int8_dot_general(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((2,), (0,)), ((), ())),
    )
    assert qb.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(qb, np.float32), np.asarray(q), rtol=0.1, atol=0.5
    )


def test_int8_zero_rows_are_safe():
    x = jnp.zeros((8, 16), jnp.float32)
    w = jnp.ones((16, 4), jnp.float32)
    out = int8_dot_general(x, w, DENSE_DN)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_batched_dot_falls_back_exact():
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.randn(2, 8, 16).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
    dn = (((2,), (1,)), ((0,), (0,)))
    np.testing.assert_array_equal(
        np.asarray(int8_dot_general(a, b, dn)),
        np.asarray(jax.lax.dot_general(a, b, dn)),
    )


def test_ste_gradient_matches_exact_dot():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(8, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(32, 16).astype(np.float32) * 0.1)

    def f_q(x, w):
        return jnp.sum(jnp.sin(int8_dot_general_ste(x, w, DENSE_DN)))

    def f_e(x, w):
        return jnp.sum(jnp.sin(x @ w))

    gq_x, gq_w = jax.grad(f_q, argnums=(0, 1))(x, w)
    ge_x, ge_w = jax.grad(f_e, argnums=(0, 1))(x, w)
    # STE backward = exact-dot backward; cos() factors differ only through
    # the (small) forward quantization error
    np.testing.assert_allclose(np.asarray(gq_x), np.asarray(ge_x),
                               rtol=0.2, atol=0.15)
    np.testing.assert_allclose(np.asarray(gq_w), np.asarray(ge_w),
                               rtol=0.2, atol=0.15)
    # the quantized forward must NOT have the zero round() gradient
    assert np.abs(np.asarray(gq_x)).max() > 0.01


def test_quant_dot_general_factory():
    assert quant_dot_general(None) is None
    assert quant_dot_general("f32") is None
    assert quant_dot_general("int8") is int8_dot_general
    assert quant_dot_general("int8_ste") is int8_dot_general_ste
    with pytest.raises(ValueError):
        quant_dot_general("fp4")


def test_nn_dense_injection():
    import flax.linen as nn

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(4, 10, 32).astype(np.float32))
    dense = nn.Dense(16)
    v = dense.init(jax.random.PRNGKey(0), x)
    qdense = nn.Dense(16, dot_general=int8_dot_general)
    exact = dense.apply(v, x)
    q = qdense.apply(v, x)
    rel = np.abs(np.asarray(q - exact)) / (np.abs(np.asarray(exact)) + 0.5)
    assert rel.max() < 0.08, rel.max()


def test_int8_dot_under_jit():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(16, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    eager = int8_dot_general(x, w, DENSE_DN)
    jitted = jax.jit(
        lambda a, b: int8_dot_general(a, b, DENSE_DN)
    )(x, w)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow  # ~74 s cold; int8 engine keeps default coverage via
# the dot/dense/STE unit tests + framed-conv parity below
def test_flagship_int8_infer_agrees():
    """Tiny WavLM joint model: int8 serving scores track the f32 scores
    and the graph runs under jit (the serving configuration)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_wavlm
    from speechlid_tpu.models.multilang import MutiLangModel
    from speechlid_tpu.models.wavlm import WavLMConfig, WavLMModel

    def tiny(quant):
        cfg = WavLMConfig(
            encoder_layers=2, encoder_embed_dim=32,
            encoder_ffn_embed_dim=64, encoder_attention_heads=4,
            conv_feature_layers="[(32,10,5)] + [(32,8,4)] + [(32,4,4)]",
            relative_position_embedding=True, num_buckets=32,
            max_distance=64, gru_rel_pos=True, mask_prob=0.0,
            quant_dot=quant,
        )
        return MutiLangModel(
            featurizer=WavLMModel(config=cfg),
            vocab_sizes=(8, 12), linear_dim=32, num_layers=1,
            dim_head=8, num_head=4, quant_dot=quant,
        )

    rng = np.random.RandomState(7)
    wavs = jnp.asarray(rng.randn(3, 3200).astype(np.float32) * 0.1)
    lengths = jnp.asarray([3200, 2400, 3200], jnp.int32)
    key = jax.random.PRNGKey(0)

    exact = tiny(None)
    v = exact.init(
        {"params": key, "dropout": key}, wavs, lengths,
        method=MutiLangModel.infer,
    )
    out_f = exact.apply(v, wavs, lengths, method=MutiLangModel.infer)
    quant = tiny("int8")
    # same param tree: quantization happens inside the graph
    out_q = jax.jit(
        lambda v, w, l: quant.apply(v, w, l, method=MutiLangModel.infer)
    )(v, wavs, lengths)

    assert out_q["logits"].shape == out_f["logits"].shape
    assert np.all(np.isfinite(np.asarray(out_q["scores"])))
    # confidence scores stay close; exact tolerance is loose because 8 int8
    # matmuls compound, but ranking-scale agreement is what serving needs
    np.testing.assert_allclose(
        np.asarray(out_q["scores"]), np.asarray(out_f["scores"]),
        rtol=0.2, atol=0.05,
    )


def test_framed_conv_extractor_parity():
    """conv_extractor_impl='matmul' (framed GEMM) must reproduce the lax
    conv lowering exactly with the SAME params — checkpoints interchange."""
    from speechlid_tpu.models.wavlm import ConvFeatureExtractor, WavLMConfig

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 2000).astype(np.float32))
    base = dict(
        conv_feature_layers="[(16,10,5)] + [(16,3,2)] + [(16,2,2)]",
        conv_bias=True,
    )
    conv = ConvFeatureExtractor(WavLMConfig(**base))
    mm = ConvFeatureExtractor(
        WavLMConfig(**base, conv_extractor_impl="matmul")
    )
    v = conv.init(jax.random.PRNGKey(0), x)
    y_conv = conv.apply(v, x)
    y_mm = mm.apply(v, x)  # identical param tree by construction
    assert y_mm.shape == y_conv.shape
    np.testing.assert_allclose(
        np.asarray(y_mm), np.asarray(y_conv), rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow  # ~55 s cold
def test_lid_task_quant_serving_path():
    """LidASRTask(quant_dot='int8') builds; its infer_fn runs on the same
    variables an exact task initialized (serving: same checkpoint, int8
    engine) and agrees on confidence-score scale."""
    from speechlid_tpu.tasks import LidASRTask

    common = dict(
        lang2vocab={"aa": 8, "bb": 12}, lang2index={"aa": 0, "bb": 1},
        n_blocks=1, encoder_dim=48, heads=2, dim_head=24,
        sub_sampling=4, head_dim_head=12, head_num_head=4,
        schedule=None, mask_times=0,
    )
    exact = LidASRTask(**common)
    quant = LidASRTask(quant_dot="int8", **common)
    assert quant.hyper_parameters["quant_dot"] == "int8"

    rng = np.random.RandomState(3)
    batch = {
        "wavs": rng.randn(2, 8000).astype(np.float32) * 0.1,
        "wav_lengths": np.asarray([8000, 6400], np.int32),
    }
    v = exact.init_variables(jax.random.PRNGKey(0), batch)
    out_f = exact.infer_fn()(v, jnp.asarray(batch["wavs"]),
                             jnp.asarray(batch["wav_lengths"]))
    out_q = jax.jit(quant.infer_fn())(v, jnp.asarray(batch["wavs"]),
                                      jnp.asarray(batch["wav_lengths"]))
    assert np.all(np.isfinite(np.asarray(out_q["scores"])))
    np.testing.assert_allclose(
        np.asarray(out_q["scores"]), np.asarray(out_f["scores"]),
        rtol=0.25, atol=0.08,
    )


@pytest.mark.slow  # ~76 s cold (QAT fwd+bwd compile)
def test_qat_training_loss_drops():
    """int8_ste end-to-end: a tiny joint model trains through the
    quantized forward (STE backward) — the QAT recipe's gradient path
    (configs/lid_wavlm_qat.yaml)."""
    import optax

    from speechlid_tpu.models.conformer import ConformerModel
    from speechlid_tpu.models.multilang import MutiLangModel
    from speechlid_tpu.ops.ctc import ctc_loss
    from speechlid_tpu.ops.frontend import frame_lengths, wav2mel

    feat = ConformerModel(
        n_blocks=1, encoder_dim=32, heads=2, dim_head=16, sub_sampling=4,
        use_stochastic_depth=False, quant_dot="int8_ste",
    )
    model = MutiLangModel(
        featurizer=feat, vocab_sizes=(8, 8), linear_dim=32, dim_head=8,
        num_head=4, quant_dot="int8_ste",
    )
    rng = np.random.RandomState(0)
    b, t, s = 4, 7840, 6
    wavs = jnp.asarray(rng.randn(b, t).astype(np.float32) * 0.1)
    lengths = jnp.full((b,), t, jnp.int32)
    texts = jnp.asarray(rng.randint(0, 7, (b, s)), jnp.int32)
    text_lengths = jnp.full((b,), s, jnp.int32)
    langs = jnp.asarray([0, 1, 0, 1], jnp.int32)

    mel = jnp.transpose(wav2mel(wavs, lengths=lengths), (0, 2, 1))
    f_len = frame_lengths(lengths, 160)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key, "stochastic_depth": key},
        mel, f_len, method=MutiLangModel.infer,
    )
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, bs, opt):
        def loss_fn(p):
            (logits, f_lens), mut = model.apply(
                {"params": p, "batch_stats": bs}, mel, f_len,
                deterministic=False, mutable=["batch_stats"],
                rngs={"dropout": key, "stochastic_depth": key},
            )
            own = jnp.take_along_axis(
                logits, langs[None, :, None, None], axis=0
            )[0]
            lp = jax.nn.log_softmax(own, axis=-1)
            return ctc_loss(lp, texts, f_lens, text_lengths, blank=-1), \
                mut["batch_stats"]

        (l, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), new_bs, opt, l

    losses = []
    for _ in range(8):
        params, bs, opt, l = step(params, bs, opt)
        losses.append(float(l))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0] * 0.9, losses

"""CTC loss parity vs torch.nn.CTCLoss (the reference's loss,
lid/WavLMMutiLangModel.py:258-263, blank=last, zero_infinity=True)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from speechlid_tpu.ops.ctc import ctc_loss, ctc_greedy_decode, ctc_collapse


def _case(b=3, t=50, c=29, s=12, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, t, c).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), dim=-1).numpy()
    labels = rng.randint(0, c - 1, size=(b, s)).astype(np.int32)  # exclude blank
    in_lens = rng.randint(t // 2, t + 1, size=(b,)).astype(np.int32)
    lab_lens = rng.randint(1, s + 1, size=(b,)).astype(np.int32)
    return log_probs, labels, in_lens, lab_lens


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("reduction", ["mean", "sum", "none"])
def test_matches_torch(seed, reduction):
    lp, labels, in_lens, lab_lens = _case(seed=seed)
    c = lp.shape[-1]
    got = np.asarray(
        ctc_loss(
            jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(in_lens),
            jnp.asarray(lab_lens), blank=c - 1, reduction=reduction,
        )
    )
    ref_fn = torch.nn.CTCLoss(blank=c - 1, zero_infinity=True, reduction=reduction)
    ref = ref_fn(
        torch.from_numpy(lp).transpose(0, 1),  # (T, B, C)
        torch.from_numpy(labels.astype(np.int64)),
        torch.from_numpy(in_lens.astype(np.int64)),
        torch.from_numpy(lab_lens.astype(np.int64)),
    ).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_blank_zero_convention():
    lp, labels, in_lens, lab_lens = _case(seed=3)
    c = lp.shape[-1]
    labels = labels + 1  # keep ids off blank=0
    labels = np.minimum(labels, c - 1)
    got = np.asarray(
        ctc_loss(jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(in_lens),
                 jnp.asarray(lab_lens), blank=0, reduction="none")
    )
    ref = torch.nn.CTCLoss(blank=0, zero_infinity=True, reduction="none")(
        torch.from_numpy(lp).transpose(0, 1),
        torch.from_numpy(labels.astype(np.int64)),
        torch.from_numpy(in_lens.astype(np.int64)),
        torch.from_numpy(lab_lens.astype(np.int64)),
    ).numpy()
    np.testing.assert_allclose(got, ref / 1.0, rtol=1e-4, atol=1e-4)


def test_zero_infinity():
    # label longer than feasible given input length → inf → zeroed
    b, t, c = 1, 4, 6
    lp = np.log(np.full((b, t, c), 1.0 / c, np.float32))
    labels = np.asarray([[1, 2, 3, 4, 1, 2, 3, 4]], np.int32)  # needs >= 8 frames
    got = np.asarray(
        ctc_loss(jnp.asarray(lp), jnp.asarray(labels), jnp.asarray([t]),
                 jnp.asarray([8]), blank=c - 1, reduction="none")
    )
    np.testing.assert_allclose(got, [0.0], atol=1e-6)


def test_gradients_match_torch():
    """Compare d(loss)/d(logits) through log_softmax — the quantity training
    uses.  (torch's raw log_probs gradient uses a fused softmax convention
    and is not the pure derivative, so it can't be compared directly.)"""
    rng = np.random.RandomState(4)
    b, t, c, s = 2, 20, 8, 5
    logits = rng.randn(b, t, c).astype(np.float32)
    labels = rng.randint(0, c - 1, size=(b, s)).astype(np.int32)
    in_lens = rng.randint(t // 2, t + 1, size=(b,)).astype(np.int32)
    lab_lens = rng.randint(1, s + 1, size=(b,)).astype(np.int32)

    def loss_fn(x):
        lp = jax.nn.log_softmax(x, axis=-1)
        return ctc_loss(lp, jnp.asarray(labels), jnp.asarray(in_lens),
                        jnp.asarray(lab_lens), blank=c - 1, reduction="sum")

    got_grad = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))

    tl = torch.from_numpy(logits).requires_grad_(True)
    tlp = torch.log_softmax(tl, dim=-1)
    ref = torch.nn.CTCLoss(blank=c - 1, zero_infinity=True, reduction="sum")(
        tlp.transpose(0, 1),
        torch.from_numpy(labels.astype(np.int64)),
        torch.from_numpy(in_lens.astype(np.int64)),
        torch.from_numpy(lab_lens.astype(np.int64)),
    )
    ref.backward()
    np.testing.assert_allclose(got_grad, tl.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_greedy_decode_and_collapse():
    # build log-probs whose argmax path is [a a blank b b blank blank c]
    c = 4  # ids 0..2, blank=3
    path = [0, 0, 3, 1, 1, 3, 3, 2]
    lp = np.full((1, len(path), c), -10.0, np.float32)
    for t, k in enumerate(path):
        lp[0, t, k] = 0.0
    ids, lens = ctc_greedy_decode(jnp.asarray(lp), jnp.asarray([len(path)]), blank=3)
    seqs = ctc_collapse(np.asarray(ids), np.asarray(lens), blank=3)
    assert seqs == [[0, 1, 2]]


def test_greedy_decode_masks_padding():
    c = 4
    lp = np.zeros((1, 6, c), np.float32)
    lp[0, :, 1] = 5.0  # argmax id 1 everywhere
    ids, lens = ctc_greedy_decode(jnp.asarray(lp), jnp.asarray([3]), blank=3)
    ids = np.asarray(ids)
    assert list(ids[0, 3:]) == [3, 3, 3]
    seqs = ctc_collapse(ids, np.asarray(lens), blank=3)
    assert seqs == [[1]]

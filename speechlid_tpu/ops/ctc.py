"""CTC loss and greedy decoding, TPU-native.

Rebuild of the reference's torch.nn.CTCLoss usage
(lid/WavLMMutiLangModel.py:258-263: ``CTCLoss(blank=vocab_size,
zero_infinity=True)`` — note *blank is the LAST id*, not 0) and the greedy
collapse decode (lid/tokenizer.py:36-68).

Design: log-space alpha recursion over ``lax.scan`` on the time axis with
static shapes; padding frames beyond ``input_lengths`` are carried through
unchanged, so one compiled program serves every batch in a bucket.  The
label axis (2S+1) is vectorized — each scan step is a (B, 2S+1) gather plus
elementwise math on the VPU.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_NEG_INF = -1e30  # finite -inf surrogate: keeps bf16/f32 arithmetic NaN-free


def ctc_loss(
    log_probs: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    blank: int = -1,
    zero_infinity: bool = True,
    reduction: str = "mean",
) -> jax.Array:
    """CTC negative log-likelihood.

    Args:
      log_probs: (B, T, C) log-softmax outputs.
      labels: (B, S) int32 padded label ids (pad value irrelevant).
      input_lengths / label_lengths: (B,) int32 valid lengths.
      blank: blank id; -1 means C-1 (the reference's blank-last convention).
      zero_infinity: replace infinite losses (S > feasible) with 0, matching
        torch's ``zero_infinity=True``.
      reduction: 'mean' (torch default: per-sample loss / label_length,
        averaged), 'sum', or 'none'.
    """
    b, t, c = log_probs.shape
    s = labels.shape[1]
    if blank < 0:
        blank = c + blank
    lp = log_probs.astype(jnp.float32)

    # Extended label sequence z: blank, l1, blank, l2, ..., blank  (2S+1)
    ext = jnp.full((b, 2 * s + 1), blank, dtype=jnp.int32)
    ext = ext.at[:, 1::2].set(labels.astype(jnp.int32))
    # allow skip (k-2 → k) only when z_k is a label differing from z_{k-2}
    prev_label = jnp.concatenate(
        [jnp.full((b, 2), blank, jnp.int32), ext[:, :-2]], axis=1
    )
    can_skip = (ext != blank) & (ext != prev_label)  # (B, 2S+1)

    k_idx = jnp.arange(2 * s + 1)[None, :]
    valid_k = k_idx < (2 * label_lengths[:, None] + 1)

    def gather_t(lp_t: jax.Array) -> jax.Array:
        # lp_t: (B, C) → (B, 2S+1)
        return jnp.take_along_axis(lp_t, ext, axis=1)

    alpha0 = jnp.full((b, 2 * s + 1), _NEG_INF)
    lp0 = gather_t(lp[:, 0])
    alpha0 = alpha0.at[:, 0].set(lp0[:, 0])
    alpha0 = alpha0.at[:, 1].set(jnp.where(label_lengths > 0, lp0[:, 1], _NEG_INF))

    def shift_right(x: jax.Array, n: int) -> jax.Array:
        return jnp.concatenate(
            [jnp.full((b, n), _NEG_INF, x.dtype), x[:, :-n]], axis=1
        )

    def step(alpha, xs):
        lp_t, t_pos = xs
        lp_ext = gather_t(lp_t)  # (B, 2S+1)
        no_skip = jnp.logaddexp(alpha, shift_right(alpha, 1))
        with_skip = jnp.logaddexp(no_skip, shift_right(alpha, 2))
        new = jnp.where(can_skip, with_skip, no_skip) + lp_ext
        new = jnp.where(valid_k, new, _NEG_INF)
        # frames at/after input_length leave alpha unchanged
        new = jnp.where((t_pos < input_lengths)[:, None], new, alpha)
        return new, None

    ts = jnp.arange(1, t)
    alpha, _ = jax.lax.scan(step, alpha0, (jnp.transpose(lp, (1, 0, 2))[1:], ts))

    last = 2 * label_lengths  # index of final blank
    a_last = jnp.take_along_axis(alpha, last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(
        alpha, jnp.maximum(last - 1, 0)[:, None], axis=1
    )[:, 0]
    a_prev = jnp.where(label_lengths > 0, a_prev, _NEG_INF)
    nll = -jnp.logaddexp(a_last, a_prev)
    # degenerate input_length == 0: the alpha init above consumed frame 0
    # unconditionally, so patch the result — empty label has probability 1,
    # any non-empty label is infeasible.
    nll = jnp.where(
        input_lengths == 0,
        jnp.where(label_lengths == 0, 0.0, -_NEG_INF),
        nll,
    )

    if zero_infinity:
        nll = jnp.where(nll >= -_NEG_INF * 0.5, 0.0, nll)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    denom = jnp.maximum(label_lengths.astype(jnp.float32), 1.0)
    return jnp.mean(nll / denom)


def ctc_greedy_decode(
    log_probs: jax.Array,
    input_lengths: Optional[jax.Array] = None,
    blank: int = -1,
) -> Tuple[jax.Array, jax.Array]:
    """Device half of greedy decoding: per-frame argmax with padding forced
    to blank.  Returns (ids (B, T) int32, input_lengths).  Collapse happens
    host-side in :func:`ctc_collapse` (string assembly is host work anyway).
    """
    b, t, c = log_probs.shape
    if blank < 0:
        blank = c + blank
    ids = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
    if input_lengths is None:
        input_lengths = jnp.full((b,), t, jnp.int32)
    frames = jnp.arange(t)[None, :]
    ids = jnp.where(frames < input_lengths[:, None], ids, blank)
    return ids, input_lengths


def ctc_collapse(
    ids: np.ndarray, lengths: np.ndarray, blank: int
) -> List[List[int]]:
    """Host-side CTC collapse: drop repeats then blanks
    (lid/tokenizer.py:36-68 semantics)."""
    ids = np.asarray(ids)
    out: List[List[int]] = []
    for row, n in zip(ids, np.asarray(lengths)):
        row = row[: int(n)]
        keep = np.ones(len(row), dtype=bool)
        keep[1:] = row[1:] != row[:-1]
        deduped = row[keep]
        out.append([int(x) for x in deduped[deduped != blank]])
    return out

"""Cross-process metric state aggregation.

The reference declares its EER/CAvg torchmetrics states with
``dist_reduce_fx="cat"`` (lid/eer.py:47-48,74) so DDP validation
concatenates every rank's (score, label) trials before computing; its
CER/WER/accuracy torchmetrics likewise sum counts across ranks.  The
TPU-native analog: under multi-host SPMD each process scores only its local
batch shard, so before ``compute()`` the host-side metric state is
all-gathered over ``jax.process_count()`` processes via
``jax.experimental.multihost_utils.process_allgather`` (DCN/ICI-backed).

Single-process runs short-circuit to a no-op — no device traffic, no jax
import cost beyond the count check.
"""

from __future__ import annotations

import numpy as np


def process_count() -> int:
    import jax

    return jax.process_count()


def allgather_rows(rows: np.ndarray, n_cols: int) -> np.ndarray:
    """Concatenate per-process row matrices of shape (n_local, n_cols)
    across all jax processes; ``n_local`` may differ per process (uneven
    validation shards — the reference handles this with DDP ``join()`` +
    torchmetrics cat).  Returns the global (sum n_local, n_cols) matrix,
    identical on every process.  Single-process: returns ``rows``."""
    rows = np.asarray(rows, dtype=np.float64).reshape(-1, n_cols)
    import jax

    if jax.process_count() == 1:
        return rows
    from jax.experimental import multihost_utils

    counts = np.asarray(
        multihost_utils.process_allgather(
            np.asarray([rows.shape[0]], np.int64)
        )
    ).reshape(-1)
    maxn = int(counts.max())
    padded = np.zeros((max(maxn, 1), n_cols), np.float64)
    padded[: rows.shape[0]] = rows
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return np.concatenate(
        [gathered[p, : int(counts[p])] for p in range(len(counts))], axis=0
    )


def allreduce_sum_counts(*counts: float) -> tuple:
    """Sum scalar counts (correct/total, errors/total) across processes —
    the ``dist_reduce_fx="sum"`` analog for count-based metrics."""
    row = np.asarray([counts], np.float64)
    total = allgather_rows(row, n_cols=len(counts)).sum(axis=0)
    return tuple(total.tolist())

"""Evaluation metrics (reference: lid/eer.py, lid/cavg.py, torchmetrics CER/WER).

Host-side, vectorized numpy — metric state lives on host (scores stream out
of the device per eval batch); multi-host sync is an allgather of the state
arrays (reference used torchmetrics dist_reduce_fx="cat", lid/eer.py:47-48).
"""

from speechlid_tpu.metrics.eer import EER, compute_eer, roc_curve
from speechlid_tpu.metrics.cavg import CAvg, compute_cavg
from speechlid_tpu.metrics.error_rate import (
    Accuracy,
    CharErrorRate,
    WordErrorRate,
    edit_distance,
)

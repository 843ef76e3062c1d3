"""Noise-robustness evaluation harness (reference: lid/test.py + the
test_*_all.sh SNR×noise sweep drivers)."""

from speechlid_tpu.eval.harness import LidEvaluator, NoiseBank
from speechlid_tpu.eval.sweep import run_factor_sweep, run_sweep

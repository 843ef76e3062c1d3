"""Task agents binding models + losses + metrics (reference: lid/LidModule*.py)."""

from speechlid_tpu.tasks.lid_asr import LidASRTask
from speechlid_tpu.tasks.lid_cross_entropy import LidCrossEntropyTask

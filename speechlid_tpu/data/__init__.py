"""Data layer (reference: lid/raw_datasets.py, lid/tokenizer.py).

Host side stays thin: manifest scanning (TTL-cached), audio file decode,
text tokenization, language-homogeneous batch composition, and **bucketed
static-shape padding** — every numeric transform (normalize, augment, fbank)
runs on device (ops/).  The reference's fractional "percent" lengths become
explicit integer length arrays.
"""

from speechlid_tpu.data.tokenizer import CTCTokenizer
from speechlid_tpu.data.manifest import (
    RawManifest,
    parse_common_voice_tsv,
    parse_xf_manifest,
)
from speechlid_tpu.data.datasets import MergedDataset, MultiBatchSampler
from speechlid_tpu.data.feeder import BucketFeeder, Batch
from speechlid_tpu.data.audio_io import read_wav, write_wav

"""Device DSP + loss ops (TPU-native rebuild of the reference's CPU audio path).

The reference does all DSP per-item on CPU inside DataLoader workers
(lid/audio_processor.py, lid/raw_datasets.py:250-308).  Here the host feeder
only decodes bytes; everything numeric — normalize, dither, preemphasis,
framing, mel fbank, CMVN, SpecAugment, noise mixing, resampling, CTC — runs
batched on device under jit, formulated so the heavy lifting (DFT, mel
projection) is matmuls on the MXU.
"""

from speechlid_tpu.ops.frontend import (
    amplitude_to_db,
    frame_lengths,
    kaldi_fbank,
    mel_filterbank,
    fused_frontend,
    log_mel_spectrogram,
    mel_spectrogram,
    resolve_method,
    normalize_wav,
    preemphasis,
    wav2mel,
)
from speechlid_tpu.ops.specaugment import spec_augment
from speechlid_tpu.ops.augment import awgn, mix_at_snr, dither
from speechlid_tpu.ops.ctc import ctc_loss, ctc_greedy_decode

"""speechlid_tpu — TPU-native spoken language identification framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
speech-lid research stack (ccml trainer + LID/ASR model families), designed
TPU-first:

- all DSP (mel fbank, SpecAugment, augmentation) runs on device with
  MXU-friendly matmul formulations and fused Pallas kernels;
- models are flax.linen modules compiled once under ``jax.jit`` with static
  padded shapes + explicit integer lengths (no ragged tensors);
- per-language "expert" CTC heads are stacked weight tensors evaluated with
  ``vmap`` so LID inference over all languages is a single compiled graph;
- scale-out is a ``jax.sharding.Mesh`` data-parallel (optionally
  tensor-parallel) ``shard_map``/pjit program, not per-process DDP;
- checkpointing uses orbax-style pytree serialization with top-k retention.

Package layout (mirrors SURVEY.md §2 component inventory):

- ``core``      — trainer, task-module contract, callbacks, loggers, optim
                  (reference: ccml/)
- ``ops``       — device DSP + CTC loss/decode kernels (reference:
                  lid/audio_processor.py, torch CTC)
- ``models``    — conformer, wavlm, wav2vec2, x-vector/resnet backends,
                  multi-language models (reference: lid/*.py model layer)
- ``data``      — manifests, tokenizer, datasets/samplers, bucketed feeder
                  (reference: lid/raw_datasets.py, lid/tokenizer.py)
- ``metrics``   — EER / Cavg / CER / WER / accuracy (reference: lid/eer.py)
- ``parallel``  — mesh construction + sharded train-step transforms
- ``decode``    — CTC beam search + n-gram LM fusion (C++ host library)
- ``eval``      — noise-robustness evaluation harness (reference: lid/test.py)
- ``tasks``     — task agents binding models+losses+metrics (reference:
                  lid/LidModule*.py)
"""

__version__ = "0.1.0"

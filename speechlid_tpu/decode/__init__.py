"""Host-side CTC beam search + n-gram LM fusion (C++ library).

Reference: lid/lm_decoder.py (OpenSeq2Seq ctc_decoders + KenLM Scorer) and
lid/test.py:202-220 (KenLM perplexity language arbitration).
"""

from speechlid_tpu.decode.beam_search import (
    BeamSearchDecoderWithLM,
    NgramLM,
    build_native_library,
)

"""ctypes bindings for the native CTC beam-search / n-gram library.

API parity with the reference wrapper (lid/lm_decoder.py
``BeamSearchDecoderWithLM.forward(probs, lengths) → List[str]`` built on the
C++ ctc_decoders + KenLM ``Scorer(alpha, beta, model_path, vocabulary)``)
and with KenLM's ``Model.perplexity`` (lid/test.py:58-60,202-220).

The shared library auto-builds from csrc/ctc_decoder on first use (g++ is
in the image; pybind11 is not, hence ctypes).  If the build fails the
decoder degrades to the pure-Python prefix beam search (no LM fusion) with
a warning.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc", "ctc_decoder",
)
_LIB_PATH = os.path.join(_CSRC, "libctc_decoder.so")
_lib = None


def build_native_library(force: bool = False) -> Optional[str]:
    """(Re)compile libctc_decoder.so; returns path or None.

    ALWAYS invokes make — its timestamp check makes an up-to-date build a
    no-op, while returning an existing .so unconditionally would silently
    keep serving a binary built from older sources after a .cc edit."""
    try:
        if force:
            subprocess.run(["make", "-C", _CSRC, "clean"],
                           capture_output=True, text=True)
        subprocess.run(
            ["make", "-C", _CSRC], check=True, capture_output=True, text=True
        )
        return _LIB_PATH
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        out = getattr(e, "stderr", "")
        if os.path.exists(_LIB_PATH):
            # no toolchain here but a prebuilt library exists — use it
            logging.warning("ctc_decoder rebuild failed (%s); using the "
                            "existing binary", e)
            return _LIB_PATH
        logging.warning("ctc_decoder native build failed: %s\n%s", e, out)
        return None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    path = build_native_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.ngram_load.restype = ctypes.c_void_p
    lib.ngram_load.argtypes = [ctypes.c_char_p]
    lib.ngram_free.argtypes = [ctypes.c_void_p]
    lib.ngram_sentence_score.restype = ctypes.c_double
    lib.ngram_sentence_score.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.ngram_perplexity.restype = ctypes.c_double
    lib.ngram_perplexity.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.ngram_order.restype = ctypes.c_int
    lib.ngram_order.argtypes = [ctypes.c_void_p]
    lib.ngram_last_error.restype = ctypes.c_char_p
    lib.ngram_last_error.argtypes = []
    lib.scorer_create.restype = ctypes.c_void_p
    lib.scorer_create.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_void_p
    ]
    lib.scorer_free.argtypes = [ctypes.c_void_p]
    lib.ctc_beam_search_batch.restype = ctypes.c_int
    lib.ctc_beam_search_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # probs
        ctypes.c_int, ctypes.c_int, ctypes.c_int,  # B, Tmax, V
        ctypes.POINTER(ctypes.c_int),  # lengths
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,  # vocab
        ctypes.c_int, ctypes.c_int,  # beam, threads
        ctypes.c_double, ctypes.c_int,  # cutoff_prob, cutoff_top_n
        ctypes.c_void_p, ctypes.c_int,  # scorer, blank
        ctypes.c_char_p, ctypes.c_int,  # out, stride
        ctypes.POINTER(ctypes.c_double),  # out_scores
    ]
    _lib = lib
    return _lib


class NgramLM:
    """n-gram language model (KenLM Model API subset:
    ``score``/``perplexity``).

    Accepts a text ARPA file or a **KenLM binary** model — both the
    default 'probing' format and the full trie family (``trie``, ``-q``
    quantized, ``-a`` bhiksha-array, ``-q -a``) built by ``build_binary``
    — the artifacts the reference loads via ``kenlm.Model``
    (lid/lm_decoder.py:23-62, lid/test.py:58-60).
    """

    def __init__(self, arpa_path: str):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native ctc_decoder library unavailable")
        self._lib = lib
        self._handle = lib.ngram_load(arpa_path.encode())
        if not self._handle:
            detail = (lib.ngram_last_error() or b"").decode()
            raise FileNotFoundError(
                f"failed to load LM (ARPA text or KenLM binary): "
                f"{arpa_path}" + (f" — {detail}" if detail else "")
            )

    @property
    def order(self) -> int:
        return self._lib.ngram_order(self._handle)

    def score(self, sentence: str) -> float:
        """Total log10 probability incl. <s> … </s> (KenLM ``score``)."""
        return self._lib.ngram_sentence_score(self._handle, sentence.encode())

    def perplexity(self, sentence: str) -> float:
        return self._lib.ngram_perplexity(self._handle, sentence.encode())

    def __del__(self):
        if getattr(self, "_handle", None) and getattr(self, "_lib", None):
            self._lib.ngram_free(self._handle)
            self._handle = None


class BeamSearchDecoderWithLM:
    """Batched CTC beam search, reference API (lid/lm_decoder.py:23-72).

    forward(probs, lengths) → List[str]; ``probs`` are softmax
    probabilities (B, T, V) — the reference passes softmax output too
    (lm_decoder.py:48,96-99).
    """

    def __init__(
        self,
        vocab: Sequence[str],
        beam_width: int = 100,
        alpha: float = 0.0,
        beta: float = 0.0,
        lm_path: Optional[str] = None,
        num_cpus: int = 4,
        cutoff_prob: float = 1.0,
        cutoff_top_n: int = 40,
        blank_id: int = -1,
    ):
        self.vocab = list(vocab)
        self.beam_width = beam_width
        self.num_cpus = num_cpus
        self.cutoff_prob = cutoff_prob
        self.cutoff_top_n = cutoff_top_n
        self.blank_id = blank_id
        self._lib = _load_lib()
        self._lm = NgramLM(lm_path) if (lm_path and self._lib) else None
        self._scorer = None
        if self._lib is not None:
            lm_handle = self._lm._handle if self._lm else None
            self._scorer = self._lib.scorer_create(
                float(alpha), float(beta), lm_handle
            )

    def forward(
        self, log_probs: np.ndarray, log_probs_length: np.ndarray
    ) -> List[str]:
        probs = np.ascontiguousarray(log_probs, dtype=np.float32)
        b, t, v = probs.shape
        lengths = np.ascontiguousarray(log_probs_length, dtype=np.int32)
        if self._lib is None:
            return self._python_fallback(probs, lengths)
        # UTF-8 budget scales with the vocab's LONGEST token: with word/
        # BPE pieces a T-frame hypothesis can exceed 4·T bytes and the C++
        # side clamps the copy — silent mid-sentence truncation otherwise
        max_tok = max((len(s.encode()) for s in self.vocab), default=1)
        out_stride = max(4, max_tok) * t + 8
        out_buf = ctypes.create_string_buffer(b * out_stride)
        scores = (ctypes.c_double * b)()
        vocab_arr = (ctypes.c_char_p * len(self.vocab))(
            *[s.encode() for s in self.vocab]
        )
        rc = self._lib.ctc_beam_search_batch(
            probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            b, t, v,
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            vocab_arr, len(self.vocab),
            self.beam_width, self.num_cpus,
            float(self.cutoff_prob), int(self.cutoff_top_n),
            self._scorer, self.blank_id,
            ctypes.cast(out_buf, ctypes.c_char_p), out_stride,
            scores,
        )
        if rc != 0:
            raise RuntimeError(f"ctc_beam_search_batch failed: {rc}")
        return [
            out_buf.raw[i * out_stride : (i + 1) * out_stride]
            .split(b"\0", 1)[0]
            .decode("utf-8", errors="replace")
            for i in range(b)
        ]

    __call__ = forward

    def _python_fallback(self, probs, lengths) -> List[str]:
        logging.warning(
            "native decoder unavailable — falling back to python prefix "
            "beam search WITHOUT LM fusion"
        )
        from speechlid_tpu.data.tokenizer import CTCTokenizer

        tok = CTCTokenizer(self.vocab)
        lp = np.log(np.maximum(probs, 1e-30))
        outs = []
        for i in range(probs.shape[0]):
            hyps = tok.ctc_prefix_beam_search(
                lp[i, : int(lengths[i])], beam_size=self.beam_width
            )
            outs.append(hyps[0][0] if hyps else "")
        return outs

    def __del__(self):
        if getattr(self, "_scorer", None) and getattr(self, "_lib", None):
            self._lib.scorer_free(self._scorer)
            self._scorer = None

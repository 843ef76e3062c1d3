"""Native CTC beam-search + n-gram LM tests.

The n-gram math is validated on a hand-built ARPA file with analytically
known probabilities; the beam search is cross-checked against the pure
python prefix beam search (tokenizer) on identical inputs.
"""

import math
import os

import numpy as np
import pytest

from speechlid_tpu.data.tokenizer import CTCTokenizer
from speechlid_tpu.decode import (
    BeamSearchDecoderWithLM,
    NgramLM,
    build_native_library,
)

ARPA = """\
\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-0.5\t<s>\t-0.30103
-0.69897\t</s>
-0.39794\tthe\t-0.30103
-0.69897\tcat\t-0.30103
-1.0\t<unk>

\\2-grams:
-0.17609\t<s> the
-0.30103\tthe cat
-0.39794\tcat </s>

\\end\\
"""


@pytest.fixture(scope="module")
def lib_built():
    path = build_native_library()
    if path is None:
        pytest.skip("native library build failed")
    return path


@pytest.fixture()
def arpa_file(tmp_path):
    p = tmp_path / "tiny.arpa"
    p.write_text(ARPA)
    return str(p)


class TestNgram:
    def test_known_scores(self, lib_built, arpa_file):
        lm = NgramLM(arpa_file)
        assert lm.order == 2
        # "the cat": <s> the (-0.17609) + the cat (-0.30103)
        #            + cat </s> (-0.39794) = -0.87506
        assert abs(lm.score("the cat") - (-0.87506)) < 1e-4

    def test_backoff(self, lib_built, arpa_file):
        lm = NgramLM(arpa_file)
        # "cat the": <s> cat missing → backoff(<s>) + uni(cat)
        #          = -0.30103 + -0.69897 = -1.0
        # "the" after "cat" → bigram "cat the" missing → backoff(cat) + uni(the)
        #          = -0.30103 + -0.39794 = -0.69897
        # "</s>" after "the" → bigram "the </s>" missing → backoff(the)+uni(</s>)
        #          = -0.30103 + -0.69897 = -1.0
        expected = -1.0 + -0.69897 + -1.0
        assert abs(lm.score("cat the") - expected) < 1e-4

    def test_oov_uses_unk(self, lib_built, arpa_file):
        lm = NgramLM(arpa_file)
        s = lm.score("dog")
        # backoff(<s>) + unk(-1.0), then "dog </s>" → backoff() + uni(</s>)
        assert s < -1.0 and s > -10.0  # used <unk>, not the hard penalty

    def test_perplexity_formula(self, lib_built, arpa_file):
        lm = NgramLM(arpa_file)
        total = lm.score("the cat")
        expected = 10.0 ** (-total / 3.0)  # 2 words + </s>
        assert abs(lm.perplexity("the cat") - expected) < 1e-6

    def test_missing_file(self, lib_built):
        with pytest.raises(FileNotFoundError):
            NgramLM("/tmp/definitely_not_here.arpa")


DATA = os.path.join(os.path.dirname(__file__), "data")


class TestKenlmBinary:
    """KenLM binary (probing) loader vs goldens from the upstream kenlm
    ``query`` tool run on tests/data/tiny_probing.klm (built from
    tests/data/tiny.arpa with upstream ``build_binary probing``)."""

    # sentence → total log10 score as printed by `query -v sentence`
    GOLDEN = {
        "the cat sat": -1.26,
        "the dog ran": -1.3599999,
        "cat the": -2.98,
        "zebra": -2.3000002,  # OOV → <unk>
    }

    def test_matches_upstream_query_tool(self, lib_built):
        lm = NgramLM(os.path.join(DATA, "tiny_probing.klm"))
        assert lm.order == 3
        for sent, want in self.GOLDEN.items():
            assert abs(lm.score(sent) - want) < 1e-4, sent

    def test_binary_matches_arpa(self, lib_built):
        """Same model through both backends must agree everywhere,
        including backoff chains and OOV paths."""
        bin_lm = NgramLM(os.path.join(DATA, "tiny_probing.klm"))
        arpa_lm = NgramLM(os.path.join(DATA, "tiny.arpa"))
        sents = [
            "the cat sat", "the dog ran", "cat the", "zebra",
            "the the the", "sat ran cat dog", "dog", "",
            "the cat sat the dog ran",
        ]
        for s in sents:
            assert abs(bin_lm.score(s) - arpa_lm.score(s)) < 1e-4, s
            assert abs(
                bin_lm.perplexity(s) - arpa_lm.perplexity(s)
            ) < 1e-3 * max(1.0, arpa_lm.perplexity(s)), s

    @pytest.mark.parametrize(
        "fixture",
        ["tiny_trie.klm",    # build_binary trie
         "tiny_qtrie.klm",   # -q 8 -b 8 (quantized)
         "tiny_atrie.klm",   # -a 64 (bhiksha array compression)
         "tiny_qatrie.klm"]  # -q 8 -b 8 -a 64 (both)
    )
    def test_trie_family_matches_upstream(self, lib_built, fixture):
        """KenLM trie-family binaries (model types 2..5) load natively and
        match the probing/ARPA scores — the reference loads such artifacts
        via kenlm.Model (lid/test.py:58-60).  Fixtures built from
        tests/data/tiny.arpa with upstream ``build_binary [flags] trie``;
        upstream-query parity also verified on a 1503-vocab 3-gram
        (worst |Δ| = 2e-6 over 50 sentences, all four variants)."""
        lm = NgramLM(os.path.join(DATA, fixture))
        assert lm.order == 3
        for sent, want in self.GOLDEN.items():
            assert abs(lm.score(sent) - want) < 1e-4, sent
        arpa_lm = NgramLM(os.path.join(DATA, "tiny.arpa"))
        for s in ["the the the", "sat ran cat dog", "dog", "",
                  "the cat sat the dog ran"]:
            assert abs(lm.score(s) - arpa_lm.score(s)) < 1e-4, s

    def test_beam_search_with_binary_lm(self, lib_built):
        """LM-fused beam decode accepts the binary model (the reference's
        Scorer path, lid/lm_decoder.py:23-62)."""
        vocab = [" ", "a", "b", "c"]
        V = len(vocab) + 1
        rng = np.random.RandomState(0)
        logits = rng.randn(2, 12, V).astype(np.float32)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        lengths = np.asarray([12, 9], np.int32)
        dec = BeamSearchDecoderWithLM(
            vocab, beam_width=16, alpha=0.5, beta=0.3,
            lm_path=os.path.join(DATA, "tiny_probing.klm"),
        )
        out = dec.forward(probs, lengths)
        assert len(out) == 2 and all(isinstance(s, str) for s in out)


class TestBeamSearch:
    VOCAB = [" ", "a", "b", "c"]  # blank = 4 (last)

    def _probs(self, path, T=None):
        V = len(self.VOCAB) + 1
        T = T or len(path)
        probs = np.full((T, V), 0.02, np.float32)
        for t, s in enumerate(path):
            probs[t] = 0.02
            probs[t, s] = 0.92
        return probs / probs.sum(-1, keepdims=True)

    def test_matches_python_prefix_search(self, lib_built):
        rng = np.random.RandomState(0)
        V = len(self.VOCAB) + 1
        logits = rng.randn(3, 20, V).astype(np.float32)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        lengths = np.asarray([20, 15, 10], np.int32)

        dec = BeamSearchDecoderWithLM(
            self.VOCAB, beam_width=30, lm_path=None, num_cpus=2
        )
        got = dec.forward(probs, lengths)

        tok = CTCTokenizer(self.VOCAB)
        want = []
        for i in range(3):
            hyps = tok.ctc_prefix_beam_search(
                np.log(probs[i, : lengths[i]]), beam_size=30
            )
            want.append(hyps[0][0])
        assert got == want

    def test_peaked_path(self, lib_built):
        probs = self._probs([1, 1, 4, 2, 4, 3])[None]  # "abc"
        dec = BeamSearchDecoderWithLM(self.VOCAB, beam_width=8)
        assert dec.forward(probs, np.asarray([6], np.int32)) == ["abc"]

    def test_lm_reranks(self, lib_built, tmp_path):
        """With a word LM strongly preferring 'b', fused decoding flips an
        acoustically ambiguous 'a'/'b' decision."""
        arpa = tmp_path / "b.arpa"
        arpa.write_text(
            "\\data\\\nngram 1=4\n\n\\1-grams:\n"
            "-0.1\t<s>\t-0.1\n-0.1\t</s>\n-5.0\ta\t-0.1\n-0.05\tb\t-0.1\n"
            "\n\\end\\\n"
        )
        V = len(self.VOCAB) + 1
        T = 3
        probs = np.full((1, T, V), 0.01, np.float32)
        probs[0, 0, 1] = 0.50   # 'a' slightly favored acoustically
        probs[0, 0, 2] = 0.46   # 'b'
        probs[0, 1, 0] = 0.9    # space → word boundary triggers LM
        probs[0, 2, 4] = 0.9    # blank
        probs /= probs.sum(-1, keepdims=True)
        lengths = np.asarray([T], np.int32)

        no_lm = BeamSearchDecoderWithLM(self.VOCAB, beam_width=16)
        assert no_lm.forward(probs, lengths)[0].strip() == "a"
        with_lm = BeamSearchDecoderWithLM(
            self.VOCAB, beam_width=16, alpha=2.0, beta=0.0,
            lm_path=str(arpa),
        )
        assert with_lm.forward(probs, lengths)[0].strip() == "b"

    def test_no_consecutive_space_bonus_exploit(self, lib_built, tmp_path):
        """Each space used to re-score the PREVIOUS word (+alpha*logP+beta
        per extra space) — degenerate space-padded hypotheses could
        outrank real ones.  A space completing an EMPTY word must score
        as unknown (huge penalty), so double spaces never win."""
        arpa = tmp_path / "w.arpa"
        arpa.write_text(
            "\\data\\\nngram 1=3\n\n\\1-grams:\n"
            "-0.1\t<s>\t-0.1\n-0.1\t</s>\n-0.2\ta\t-0.1\n"
            "\n\\end\\\n"
        )
        V = len(self.VOCAB) + 1
        T = 5
        probs = np.full((1, T, V), 0.01, np.float32)
        probs[0, 0, 1] = 0.9    # 'a'
        probs[0, 1, 0] = 0.9    # space (completes 'a')
        probs[0, 2, 0] = 0.48   # space vs blank ambiguous
        probs[0, 2, 4] = 0.44
        probs[0, 3, 0] = 0.48
        probs[0, 3, 4] = 0.44
        probs[0, 4, 1] = 0.9    # 'a'
        probs /= probs.sum(-1, keepdims=True)
        dec = BeamSearchDecoderWithLM(
            self.VOCAB, beam_width=16, alpha=1.0, beta=3.0,
            lm_path=str(arpa),
        )
        hyp = dec.forward(probs, np.asarray([T], np.int32))[0]
        assert "  " not in hyp, hyp

    def test_arpa_unk_ngrams_participate(self, lib_built, tmp_path):
        """KenLM maps every OOV token to <unk>, so n-grams/backoffs
        involving <unk> apply; literal-string lookup missed them."""
        arpa = tmp_path / "unk.arpa"
        arpa.write_text(
            "\\data\\\nngram 1=5\nngram 2=1\n\n\\1-grams:\n"
            "-0.1\t<s>\t-0.1\n-0.1\t</s>\n"
            "-1.0\t<unk>\t-0.3\n-0.5\ta\t-0.3\n-0.7\tb\n"
            "\n\\2-grams:\n-0.2\t<unk> b\n\n\\end\\\n"
        )
        lm = NgramLM(str(arpa))
        # "zzz" is OOV → <unk>:
        #   P(<unk>|<s>)  = backoff(<s>) -0.1 + unigram -1.0 = -1.1
        #   P(b|<unk>)    = bigram "<unk> b"                = -0.2
        #   P(</s>|b)     = unigram                          = -0.1
        assert abs(lm.score("zzz b") - (-1.4)) < 1e-6, lm.score("zzz b")

    def test_throughput_smoke(self, lib_built):
        """Batched multithreaded decode of realistic sizes completes fast."""
        import time

        rng = np.random.RandomState(0)
        V = 30
        vocab = [" "] + [chr(ord("a") + i) for i in range(V - 2)]
        logits = rng.randn(8, 200, V).astype(np.float32)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        lengths = np.full((8,), 200, np.int32)
        dec = BeamSearchDecoderWithLM(vocab, beam_width=100, num_cpus=8,
                                      cutoff_top_n=10)
        t0 = time.perf_counter()
        out = dec.forward(probs, lengths)
        dt = time.perf_counter() - t0
        assert len(out) == 8
        assert dt < 20.0, f"decode too slow: {dt:.1f}s"

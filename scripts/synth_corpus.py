"""Synthetic tone-code LID corpus: separable, CTC-learnable, eval-honest.

Design (round-4, replacing train_chip_demo's harmonic-hum corpus whose
audio did not encode the transcript, so CTC could only memorize and eval
accuracy pinned near chance — docs/runs/CHIP_FINDINGS_r3.md):

- audio ENCODES the transcript: each char is a ~0.14 s tone segment from a
  global tone ladder, so the per-language CTC heads have a genuinely
  learnable acoustics->text mapping;
- FULLY-DISJOINT tone alphabets (v4): each of 3 languages owns 8 of a
  24-tone ladder.  v3 ("mostly-disjoint", 3 shared tones between adjacent
  languages) plateaued at LID acc ~0.44: the round-5 score diagnostic
  (scripts/score_diagnostic.py on the r5 chip run) showed wrong-language
  heads transcribing FULL-LENGTH garbage in their own alphabets with
  per-frame confidence equal to the true head's (mean non-blank evidence
  25.2 frames wrong vs 23.6 true; aa<->cc confusions despite zero shared
  tones) — CTC heads extrapolate confidently off-manifold, and the
  reference confidence formula (WavLMMutiLangModel.py:410-427) averages
  only over non-blank frames, so evidence quality, not quantity, decides.
  Disjointness removes the legitimate cross-decodes; the two text-level
  mechanisms below handle the extrapolated ones;
- LEXICON texts (v4): each language draws words from a FIXED 14-word
  lexicon instead of random char strings.  (a) the per-language head block
  (ConformerLinear) learns its lexicon's transition structure, so
  off-language audio decodes to out-of-lexicon junk at lower confidence;
  (b) the word-unigram ARPA LMs (write_lms) cover the lexicon EXACTLY, so
  the reference's perplexity arbitration (test.py:202-220) genuinely
  separates in-lexicon true decodes from junk — v3 built LMs over a
  SAMPLE of an unbounded random-word space, val words were ~all <unk>,
  and arbitration was a no-op (clean acc 0.375 with 32/72 arbitrated);
- language-specific TIMBRE (harmonic amplitude profile) over the shared
  ladder: the own-language head sees on-manifold features;
- ladder 460→2200 Hz geometric (≈1/10-octave steps) keeps the highest
  3rd harmonic (6.6 kHz) below Nyquist at 16 kHz;
- held-out val utterances from the same generator with a different seed
  (written under wav/train/ because the XF manifest layout hardcodes that
  subdir — reference raw_datasets.py:111-112).
"""

from __future__ import annotations

import math
import os

import numpy as np

SR = 16000
TONES = [460.0 * ((2200.0 / 460.0) ** (k / 23.0)) for k in range(24)]
LANG_CHARS = {  # 8 chars each; tone index = (start + j) % len(TONES)
    "aa": ("abcdefgh", 0),
    "bb": ("ijklmnop", 8),
    "cc": ("qrstuvwx", 16),
}
LEXICON_SIZE = 14  # fixed per-language word inventory (see make_lexicon)
LANG_TIMBRE = {  # (fundamental, 2nd, 3rd) harmonic amplitudes
    "aa": (1.0, 0.05, 0.02),
    "bb": (0.4, 1.0, 0.1),
    "cc": (0.3, 0.1, 1.0),
}
SEG = 0.14  # seconds per char


def synth_utterance(lang: str, text: str, rng) -> np.ndarray:
    chars, start = LANG_CHARS[lang]
    h1, h2, h3 = LANG_TIMBRE[lang]
    segs = []
    for ch in text:
        n = int(SR * SEG * (0.9 + 0.2 * rng.rand()))
        t = np.arange(n) / SR
        if ch == " ":
            segs.append(0.005 * rng.randn(n))
            continue
        f = (TONES[(start + chars.index(ch)) % len(TONES)]
             * (1 + 0.01 * rng.randn()))
        ph = rng.rand() * 6.28
        w = (h1 * np.sin(2 * np.pi * f * t + ph)
             + h2 * np.sin(2 * np.pi * 2 * f * t + ph)
             + h3 * np.sin(2 * np.pi * 3 * f * t + ph))
        env = np.minimum(1.0, np.minimum(t, t[::-1] + 1e-9) / 0.02)
        segs.append(w * env)
    wav = np.concatenate(segs)
    am = 0.75 + 0.25 * np.sin(2 * np.pi * (1.5 + rng.rand())
                              * np.arange(len(wav)) / SR)
    wav = wav * am + 0.01 * rng.randn(len(wav))
    return (0.2 * wav / np.max(np.abs(wav))).astype(np.float32)


def make_lexicon(lang: str) -> list:
    """Deterministic per-language word inventory (LEXICON_SIZE unique
    words, 2-4 chars).  Deterministic so train/val texts, the head's
    learned transition structure, and write_lms' ARPA all share ONE
    closed vocabulary."""
    chars, start = LANG_CHARS[lang]
    rng = np.random.RandomState(1000 + start)
    words: list = []
    seen = set()
    while len(words) < LEXICON_SIZE:
        w = "".join(rng.choice(list(chars), size=rng.randint(2, 5)))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def make_text(lang: str, rng) -> str:
    lex = make_lexicon(lang)
    return " ".join(lex[rng.randint(len(lex))]
                    for _ in range(rng.randint(2, 4)))


def make_corpus(root: str, n_train: int = 64, n_val: int = 24):
    """Write per-language train.txt / val.txt manifests + wavs.
    All audio under wav/train/ (XF layout, split hardcoded upstream)."""
    from speechlid_tpu.data.audio_io import write_wav

    for li, lang in enumerate(sorted(LANG_CHARS)):
        wav_dir = os.path.join(root, lang, "wav", "train")
        os.makedirs(wav_dir, exist_ok=True)
        for split, n, seed in (("train", n_train, 100 + li),
                               ("val", n_val, 200 + li)):
            rng = np.random.RandomState(seed)
            lines = []
            for i in range(n):
                text = make_text(lang, rng)
                wav = synth_utterance(lang, text, rng)
                name = f"{split}{i}.wav"
                write_wav(os.path.join(wav_dir, name), wav, SR)
                lines.append(f"{name}\t{text}")
            with open(os.path.join(root, lang, f"{split}.txt"), "w") as f:
                f.write("\n".join(lines))


def write_noises(noise_dir: str) -> None:
    """NOISEX-92 stand-ins: white, babble (many-voice hum), factory1."""
    from speechlid_tpu.data.audio_io import write_wav

    rng = np.random.RandomState(7)
    t = np.arange(SR * 4) / SR
    white = rng.randn(len(t)) * 0.3
    babble = sum(
        np.sin(2 * np.pi * f * t + rng.rand() * 6.28)
        * (0.5 + 0.5 * np.sin(2 * np.pi * r * t))
        for f, r in [(170, 2.3), (220, 3.1), (310, 1.7), (450, 2.9)]
    ) * 0.15 + 0.05 * rng.randn(len(t))
    factory = (0.4 * np.sin(2 * np.pi * 50 * t)
               + 0.25 * np.sin(2 * np.pi * 120 * t)
               + 0.2 * rng.randn(len(t)))
    os.makedirs(noise_dir, exist_ok=True)
    for name, wav in [("white", white), ("babble", babble),
                      ("factory1", factory)]:
        write_wav(os.path.join(noise_dir, f"{name}.wav"),
                  wav.astype(np.float32), SR)


def write_lms(lm_dir: str) -> None:
    """Per-language word-unigram ARPA over the language's EXACT lexicon
    (make_lexicon — the closed vocabulary every text is drawn from), so
    perplexity arbitration discriminates: in-lexicon true decodes score
    ~1/(V+1) per word, out-of-lexicon junk falls to <unk> at -3."""
    os.makedirs(lm_dir, exist_ok=True)
    for li, lang in enumerate(sorted(LANG_CHARS)):
        words = sorted(make_lexicon(lang))
        logp = math.log10(1.0 / (len(words) + 1))
        lines = ["\\data\\", f"ngram 1={len(words) + 3}", "",
                 "\\1-grams:", "-3.00\t<unk>", f"{logp:.4f}\t<s>",
                 f"{logp:.4f}\t</s>"]
        lines += [f"{logp:.4f}\t{w}" for w in words]
        lines += ["", "\\end\\", ""]
        with open(os.path.join(lm_dir, f"{lang}.arpa"), "w") as f:
            f.write("\n".join(lines))

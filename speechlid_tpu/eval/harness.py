"""Offline LID/ASR evaluation with noise injection and LM arbitration.

Rebuild of the reference's eval pipeline (lid/test.py XFResult):

- per utterance: load → mix a noise recording at target SNR
  (add_noise, test.py:168-182) → optional speech-enhancement blend
  (the reference calls a closed-source SE model over HTTP,
  test.py:184-197 — here a pluggable ``enhance_fn`` host hook) →
  normalize → all-language infer;
- LID disambiguation: if the top-2 confidence margin is inside
  ``kenlm_threshold`` (_need_lm, test.py:68-76), greedy-decode EVERY
  language head and pick the language whose n-gram LM gives the lowest
  perplexity (lm_select, test.py:202-220);
- scores renormalized via -1/(s-1e-9) (test.py:122-126) feed EER/CAvg;
  CER/WER and accuracy accumulate over the manifest; per-utterance records
  can be dumped to CSV (test.py:475-476).

TPU-first: utterances stream through the bucketed feeder and the noisy
forward runs BATCHED under one jit per bucket (the reference loops
utterance-by-utterance on CPU/GPU); only ambiguous utterances pay the
host-side decode + LM arbitration cost.
"""

from __future__ import annotations

import csv
import logging
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from speechlid_tpu.data.audio_io import read_wav
from speechlid_tpu.data.feeder import Batch, BucketFeeder
from speechlid_tpu.metrics import CAvg, CharErrorRate, EER, WordErrorRate
from speechlid_tpu.ops.augment import mix_at_snr
from speechlid_tpu.tasks.lid_asr import LidASRTask, normalize_scores


class NoiseBank:
    """NOISEX-92-style noise recordings; random crop/tile to length
    (reference add_noise crop logic, test.py:168-178)."""

    def __init__(self, noise_paths: Dict[str, str], seed: int = 0):
        self.noises = {
            name: read_wav(path)[0] for name, path in noise_paths.items()
        }
        self.rng = np.random.RandomState(seed)

    def sample(self, name: str, length: int, batch: int) -> np.ndarray:
        if name not in self.noises:
            raise KeyError(
                f"unknown noise {name!r}; available: {sorted(self.noises)}"
            )
        noise = self.noises[name]
        if len(noise) < length:
            reps = length // len(noise) + 1
            noise = np.tile(noise, reps)
        out = np.empty((batch, length), np.float32)
        for i in range(batch):
            start = self.rng.randint(0, len(noise) - length + 1)
            out[i] = noise[start : start + length]
        return out


@dataclass
class EvalResult:
    acc: float
    eer: float
    cavg: float
    cer: float
    n_utts: int
    avg_time_s: float
    lm_arbitrated: int
    # ground-truth-target variants (the plain eer/cavg follow the reference
    # and score against the model's own argmax, test.py:317-318)
    eer_true: float = float("nan")
    cavg_true: float = float("nan")
    records: List[Dict] = field(default_factory=list)

    def as_dict(self) -> Dict:
        return {
            "acc": self.acc, "eer": self.eer, "cavg": self.cavg,
            "eer_true": self.eer_true, "cavg_true": self.cavg_true,
            "cer": self.cer, "n_utts": self.n_utts,
            "avg_time_s": self.avg_time_s,
            "lm_arbitrated": self.lm_arbitrated,
        }


class LidEvaluator:
    def __init__(
        self,
        task: LidASRTask,
        variables: Dict,
        lms: Optional[Dict[str, object]] = None,  # lang → NgramLM
        kenlm_threshold: float = 0.04,
        noise_bank: Optional[NoiseBank] = None,
        enhance_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        enhance_factor: float = 0.0,
        seed: int = 0,
    ):
        self.task = task
        self.variables = variables
        self.lms = lms or {}
        self.kenlm_threshold = kenlm_threshold
        self.noise_bank = noise_bank
        self.enhance_fn = enhance_fn
        self.enhance_factor = enhance_factor
        self.key = jax.random.PRNGKey(seed)
        self._infer = jax.jit(task.infer_fn())
        self._mix = jax.jit(mix_at_snr)

    # ------------------------------------------------------------------ core
    def _corrupt(self, wavs: np.ndarray, lengths: np.ndarray,
                 snr_db: Optional[float], noise_name: Optional[str]):
        if snr_db is not None and (self.noise_bank is None
                                   or noise_name is None):
            # a result labeled "SNR=x" must never secretly be clean audio
            raise ValueError(
                f"snr_db={snr_db} requested but "
                f"{'no noise bank was loaded' if self.noise_bank is None else 'no noise name was given'}"
                " — pass --noise-dir and --noise (or drop --snr)"
            )
        if snr_db is None or self.noise_bank is None or noise_name is None:
            out = wavs
        else:
            noise = self.noise_bank.sample(
                noise_name, wavs.shape[1], wavs.shape[0]
            )
            out = np.asarray(
                self._mix(
                    self.key, jnp.asarray(wavs), jnp.asarray(noise),
                    float(snr_db), jnp.asarray(lengths),
                )
            )
        if self.enhance_fn is not None and self.enhance_factor > 0:
            # reference blends enhanced and raw audio by `factor`
            # (test.py:102-104)
            enhanced = np.stack([self.enhance_fn(w) for w in out])
            out = self.enhance_factor * enhanced + (1 - self.enhance_factor) * out
        return out

    def evaluate(
        self,
        feeder: BucketFeeder,
        snr_db: Optional[float] = None,
        noise: Optional[str] = None,
        csv_path: Optional[str] = None,
        max_batches: Optional[int] = None,
    ) -> EvalResult:
        eer = EER(num_class=self.task.n_lang)
        cavg = CAvg(num_class=self.task.n_lang)
        eer_true = EER(num_class=self.task.n_lang)
        cavg_true = CAvg(num_class=self.task.n_lang)
        err = CharErrorRate() if self.task.use_cer else WordErrorRate()
        correct = total = arbitrated = 0
        records: List[Dict] = []
        t0 = time.perf_counter()

        assert not feeder.arrays_only, "evaluator needs Batch with paths"
        for bi, batch in enumerate(feeder):
            if max_batches is not None and bi >= max_batches:
                break
            wavs = self._corrupt(batch.wavs, batch.wav_lengths, snr_db, noise)
            out = self._infer(
                self.variables, jnp.asarray(wavs),
                jnp.asarray(batch.wav_lengths),
            )
            scores = np.asarray(out["scores"])  # (B, L)
            logits = np.asarray(out["logits"])  # (L, B, T, V)
            feat_lens = np.asarray(out["feat_lengths"])
            prob = normalize_scores(scores)
            pred = prob.argmax(-1)
            nv = batch.n_valid or len(pred)  # drop repeat-padded rows
            prob, pred = prob[:nv], pred[:nv]

            # LM arbitration for close calls (test.py:68-76,105-120)
            for i in range(len(pred)):
                top2 = np.sort(prob[i])[-2:]
                if (
                    self.lms
                    and len(top2) >= 2  # pure-ASR: nothing to arbitrate
                    and top2[1] - top2[0] < self.kenlm_threshold
                ):
                    arbitrated += 1
                    pred[i] = self._lm_select(logits[:, i], feat_lens[i],
                                              default=int(pred[i]))

            langs = batch.langs[:nv]
            correct += int((pred == langs).sum())
            total += len(langs)
            eer.update(prob, pred)
            cavg.update(prob, pred)
            eer_true.update(prob, langs)
            cavg_true.update(prob, langs)

            # ASR error rate on the TRUE language's head
            if self.task.tokenizers:
                vmax = max(self.task.vocab_sizes)
                for i in range(len(langs)):
                    lang = self.task.index2lang[int(langs[i])]
                    tok = self.task.tokenizers.get(lang)
                    if tok is None:
                        continue
                    own = logits[int(langs[i]), i, : int(feat_lens[i])]
                    ids = own.argmax(-1)[None, :]
                    hyp = tok.ctc_decode(ids, [ids.shape[1]], blank_id=vmax)[0]
                    ref = tok.decoder(
                        batch.texts[i : i + 1], [int(batch.text_lengths[i])]
                    )[0]
                    err.update([hyp], [ref])
                    records.append(
                        {
                            "path": batch.paths[i],
                            "true_lang": lang,
                            "pred_lang": self.task.index2lang[int(pred[i])],
                            "score": float(prob[i].max()),
                            "hyp": hyp,
                            "ref": ref,
                        }
                    )

        wall = time.perf_counter() - t0
        result = EvalResult(
            acc=correct / max(total, 1),
            eer=eer.compute() if total else float("nan"),
            cavg=cavg.compute() if total else float("nan"),
            eer_true=eer_true.compute() if total else float("nan"),
            cavg_true=cavg_true.compute() if total else float("nan"),
            cer=err.compute(),
            n_utts=total,
            avg_time_s=wall / max(total, 1),
            lm_arbitrated=arbitrated,
            records=records,
        )
        if csv_path:
            self._dump_csv(csv_path, result)
        logging.info("eval snr=%s noise=%s: %s", snr_db, noise,
                     result.as_dict())
        return result

    def _lm_select(self, logits_all: np.ndarray, feat_len: int,
                   default: int = 0) -> int:
        """Greedy-decode every head, pick lowest-perplexity language
        (lm_select, test.py:202-220).  ``default`` (the model's own
        argmax) wins when no LM produces a finite perplexity — a missing
        LM or all-blank decodes must not force language 0."""
        vmax = max(self.task.vocab_sizes)
        ppls: Dict[int, float] = {}
        for lang, idx in self.task.lang2index.items():
            tok = self.task.tokenizers.get(lang)
            lm = self.lms.get(lang)
            if tok is None or lm is None:
                continue
            ids = logits_all[idx, : int(feat_len)].argmax(-1)[None, :]
            text = tok.ctc_decode(ids, [ids.shape[1]], blank_id=vmax)[0]
            ppl = lm.perplexity(text) if text.strip() else float("inf")
            if np.isfinite(ppl):
                ppls[idx] = ppl
        if not ppls:
            return default
        best_ppl = min(ppls.values())
        winners = [i for i, p in ppls.items() if p <= best_ppl * (1 + 1e-9)]
        # all-OOV decodes give IDENTICAL pure-<unk> perplexity; the
        # reference's bare argmin picks dict-order-first on such ties (a
        # constant language) — a tie carries no LM evidence, so keep the
        # acoustic argmax when it is among the tied winners
        if default in winners:
            return default
        return winners[0]

    @staticmethod
    def _dump_csv(path: str, result: EvalResult) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", newline="") as f:
            if not result.records:
                return
            writer = csv.DictWriter(f, fieldnames=result.records[0].keys())
            writer.writeheader()
            writer.writerows(result.records)

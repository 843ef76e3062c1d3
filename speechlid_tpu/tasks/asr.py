"""Standalone CTC ASR task (reference: wav2vec-exp/ — S3prlModel +
wav2vec_module on LibriSpeech/aishell).

A single-language specialization of the joint LID machinery: one CTC head
over a Conformer or SSL featurizer, CER/WER eval with optional native
beam-search + n-gram LM fusion at test time
(wav2vec-exp/wav2vec_module.py:187-191), plus a random-search driver for
LM fusion hyperparameters (the wandb bayes sweep analog,
wav2vec-exp/sweep.yml: beam_width/cutoff_top_n/alpha/beta minimizing
test_cer).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from speechlid_tpu.data.tokenizer import CTCTokenizer
from speechlid_tpu.tasks.lid_asr import LidASRTask

_LANG = "default"


class ASRTask(LidASRTask):
    def __init__(
        self,
        vocab: Sequence[str],
        lm_path: Optional[str] = None,
        beam_width: int = 100,
        alpha: float = 1.0,
        beta: float = 0.5,
        cutoff_top_n: int = 40,
        cutoff_prob: float = 1.0,
        num_cpus: int = 4,
        **kwargs: Any,
    ) -> None:
        tokenizer = CTCTokenizer(list(vocab))
        super().__init__(
            lang2vocab={_LANG: tokenizer.vocab_size},
            lang2index={_LANG: 0},
            tokenizers={_LANG: tokenizer},
            **kwargs,
        )
        self.hyper_parameters.update(
            vocab=list(vocab), lm_path=lm_path, beam_width=beam_width,
            alpha=alpha, beta=beta, cutoff_top_n=cutoff_top_n,
            cutoff_prob=cutoff_prob,
        )
        self.lm_path = lm_path
        self.beam_params = dict(
            beam_width=beam_width, alpha=alpha, beta=beta,
            cutoff_top_n=cutoff_top_n, cutoff_prob=cutoff_prob,
            num_cpus=num_cpus,
        )
        self._decoder = None

    @property
    def tokenizer(self) -> CTCTokenizer:
        return self.tokenizers[_LANG]

    def _get_decoder(self):
        if self._decoder is None and self.lm_path is not None:
            from speechlid_tpu.decode import BeamSearchDecoderWithLM

            self._decoder = BeamSearchDecoderWithLM(
                self.tokenizer.export_vocab(),
                lm_path=self.lm_path,
                **self.beam_params,
            )
        return self._decoder

    def test_loop_end(self, outputs: List[Dict]) -> Dict[str, float]:
        """Greedy metrics via the parent, plus LM beam decode when an ARPA
        model is configured (the reference's test-time fusion)."""
        result = super().val_loop_end(outputs)
        decoder = self._get_decoder()
        if decoder is None:
            return result
        self.err_fn.reset()
        for out in outputs:
            # own-head logits were reduced to argmax for the greedy path;
            # re-derive probabilities from the per-frame log-probs we kept
            lp = out.get("log_probs")
            if lp is None:
                logging.warning("beam decode needs 'log_probs' in outputs")
                return result
            # slice repeat-padded duplicate rows like the greedy path
            nv = int(out.get("n_valid", 0)) or len(np.asarray(out["langs"]))
            probs = np.exp(np.asarray(lp))[:nv]
            feat_lens = np.asarray(out["feat_lens"])[:nv]
            hyps = decoder.forward(probs, feat_lens)
            texts = np.asarray(out["texts"])[:nv]
            text_lens = np.asarray(out["text_lengths"])[:nv]
            refs = [
                self.tokenizer.decoder(
                    texts[i : i + 1], [int(text_lens[i])]
                )[0]
                for i in range(len(hyps))
            ]
            self.err_fn.update(hyps, refs)
        result["test_cer_lm"] = self.err_fn.compute()
        return result

    def val_loop(self, variables, batch):
        # ONE forward: rebuild the parent's output dict from a single
        # _forward_ctc instead of calling super() (which runs the whole
        # encoder again just to discard its log-probs)
        from speechlid_tpu.models.multilang import lang_confidence_scores

        loss, logits, lp, feat_lens, _ = self._forward_ctc(
            variables, batch, None, True
        )
        scores = lang_confidence_scores(
            logits, jnp.asarray(self.vocab_sizes), feat_lens
        )
        out = {
            "loss": loss,
            "scores": scores,
            "pred_ids": jnp.argmax(lp, axis=-1).astype(jnp.int32),
            "feat_lens": feat_lens,
            "langs": batch["langs"],
            "texts": batch["texts"],
            "text_lengths": batch["text_lengths"],
            "log_probs": lp,
        }
        if "n_valid" in batch:
            out["n_valid"] = batch["n_valid"]
        return out


def lm_param_search(
    vocab: Sequence[str],
    lm_path: str,
    log_probs: np.ndarray,  # (N, T, V) own-head log-probs
    lengths: np.ndarray,
    references: Sequence[str],
    n_trials: int = 20,
    seed: int = 0,
    alpha_range=(0.0, 3.0),
    beta_range=(-2.0, 2.0),
    beam_widths=(50, 100, 200),
    cutoff_top_ns=(20, 40),
    num_cpus: int = 8,
) -> List[Dict]:
    """Random search over LM-fusion hyperparameters minimizing CER on cached
    logits (the reference ran a wandb bayes sweep re-running decode only,
    wav2vec-exp/main_lm_search.py).  Returns trials sorted by CER."""
    from speechlid_tpu.decode import BeamSearchDecoderWithLM
    from speechlid_tpu.metrics import CharErrorRate

    rng = np.random.RandomState(seed)
    probs = np.exp(np.asarray(log_probs, np.float32))
    trials = []
    for t in range(n_trials):
        params = {
            "alpha": float(rng.uniform(*alpha_range)),
            "beta": float(rng.uniform(*beta_range)),
            "beam_width": int(rng.choice(beam_widths)),
            "cutoff_top_n": int(rng.choice(cutoff_top_ns)),
        }
        dec = BeamSearchDecoderWithLM(
            list(vocab), lm_path=lm_path, num_cpus=num_cpus, **params
        )
        hyps = dec.forward(probs, np.asarray(lengths))
        cer = CharErrorRate()
        cer.update(hyps, list(references))
        params["cer"] = cer.compute()
        trials.append(params)
        logging.info("lm_search trial %d: %s", t, params)
    trials.sort(key=lambda d: d["cer"])
    return trials

"""Joint LID + per-language CTC-ASR task.

Rebuild of the reference's supervised joint agent family
(lid/LidModule_ASR.py / LidModule_ASR_Supervised.py over
ConformerMutiLangModel / WavLMMutiLangModel):

- train: language-homogeneous batches (MultiBatchSampler); fbank (+
  SpecAugment) → Conformer featurizer → the utterance's OWN language head →
  CTC loss with blank-last (LidModule_ASR.py:174-219).  All heads exist in
  one graph; gradient flows only through the selected head's rows via the
  one-hot gather.
- val: CTC loss + greedy-decode ids (host CER at epoch end) + all-head
  confidence scores; EER/CAvg accumulate on the ``-1/(s-1e-9)``-normalized
  probability vector and accuracy on its argmax (LidModule_ASR.py:329-409).
- freeze schedule hooks: ``freeze_featurizer_epoch`` keeps the encoder
  frozen through epoch N; ``keep_train_lang`` freezes every head but one
  (reference keep_last_lang_model_train, WavLMMutiLangModel.py:114-123).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from speechlid_tpu.core.module import TaskModule
from speechlid_tpu.core.optim import make_optimizer
from speechlid_tpu.data.tokenizer import CTCTokenizer
from speechlid_tpu.metrics import CAvg, CharErrorRate, EER, WordErrorRate
from speechlid_tpu.models.conformer import ConformerModel
from speechlid_tpu.models.multilang import (
    MutiLangModel,
    lang_confidence_scores,
)
from speechlid_tpu.ops.ctc import ctc_loss
from speechlid_tpu.ops.frontend import (
    frame_lengths,
    fused_frontend,
    normalize_wav,
    wav2mel,
)


def normalize_scores(scores: np.ndarray) -> np.ndarray:
    """(B, L) raw confidences → probability-like vector via the reference's
    -1/(s-1e-9) map + sum-normalization (LidModule_ASR.py:354-356)."""
    p = -1.0 / (scores - 1e-9)
    return p / p.sum(axis=-1, keepdims=True)


class LidASRTask(TaskModule):
    rng_keys = (
        "dropout", "stochastic_depth", "specaug", "params",
        "mask", "mask_channel",  # SSL span/channel masking streams
        "layerdrop",  # WavLM encoder_layerdrop > 0 draws per-layer keeps
    )

    def __init__(
        self,
        lang2vocab: Dict[str, int],
        lang2index: Dict[str, int],
        tokenizers: Optional[Dict[str, CTCTokenizer]] = None,
        # featurizer: 'conformer' (reference conformer_pure) or SSL upstream
        # 'wavlm' / 'wav2vec2' (reference WavLMMutiLangModel /
        # Wav2vecMutiLangModel), optionally warm-started from pt_path
        featurizer: str = "conformer",
        pt_path: Optional[str] = None,
        feature_selection: str = "last_hidden_state",
        ssl_config: Optional[Dict] = None,
        # model
        n_blocks: int = 14,
        encoder_dim: int = 144,
        heads: int = 4,
        dim_head: int = 64,
        sub_sampling: int = 4,
        head_type: str = "conformer_linear",
        head_layers: int = 1,
        head_dim_head: int = 32,
        head_num_head: int = 8,
        double_swish: bool = False,
        dropout: float = 0.1,
        # conformer-featurizer regularizers (reference defaults: pos-enc
        # dropout 0.1, stochastic depth on with p=0.7 —
        # lid/conformer.py:414,449)
        pos_dropout: float = 0.1,
        use_stochastic_depth: bool = True,
        stochastic_depth_p: float = 0.7,
        use_cer: bool = True,
        # frontend
        sample_rate: int = 16000,
        n_mels: int = 80,
        t_mask_ratio: float = 0.05,
        f_mask: int = 27,
        mask_times: int = 2,
        t_stretch: bool = False,
        # optim
        lr: float = 1e-3,
        optimizer: str = "adam",
        schedule: Optional[str] = "tristage",
        schedule_conf: Optional[Dict] = None,
        clip_norm: float = 20.0,
        # routing-aware Adam (core/optim/routed.py): per-language head
        # moments/step-counts freeze on batches that don't route to them —
        # exact torch grad=None-skip semantics for the reference's
        # ModuleDict heads (ConformerLangModel.py:275-280).  Off by default
        # (plain optax adam; checkpoints keep the standard opt-state tree).
        routed_optim: bool = False,
        # rematerialize encoder blocks in the backward pass (stable axon
        # config; ~30% activation-memory saving)
        remat: bool = False,
        # nn.scan the conformer block stack: O(1)-in-depth compiles on
        # remote-compile TPU deployments (params stack on a layer axis)
        scan_blocks: bool = False,
        # compute dtype: 'bfloat16' puts activations/matmuls on the MXU's
        # native precision (the AMP analog — SURVEY.md §2.5 row 'AMP');
        # params and softmax/layernorm accumulations stay f32
        dtype: str = "float32",
        # dynamic int8 W8A8 dense projections (ops/quant.py): 'int8' for
        # the 2×-rate MXU serving path (approximate numerics), 'int8_ste'
        # for quantization-aware fine-tuning. Checkpoints are unchanged.
        quant_dot: Optional[str] = None,
        # SSL conv-extractor lowering: 'matmul' frames the strided convs
        # into GEMMs (exact parity; required for int8 extractor dots)
        ssl_conv_impl: Optional[str] = None,
        # freeze schedule (reference before_train_loop epoch gates,
        # LidModule_ASR.py:279-304)
        freeze_featurizer_epoch: int = -1,
        freeze_transformer_epoch: int = -1,
        keep_train_lang: Optional[str] = None,
        **extra: Any,
    ) -> None:
        super().__init__()
        self.save_hyper_parameters(
            ignore=("tokenizers",),
            featurizer=featurizer, pt_path=pt_path,
            feature_selection=feature_selection, ssl_config=ssl_config,
            lang2vocab=lang2vocab, lang2index=lang2index, n_blocks=n_blocks,
            encoder_dim=encoder_dim, heads=heads, dim_head=dim_head,
            sub_sampling=sub_sampling, head_type=head_type,
            head_layers=head_layers, head_dim_head=head_dim_head,
            head_num_head=head_num_head, double_swish=double_swish,
            dropout=dropout, pos_dropout=pos_dropout,
            use_stochastic_depth=use_stochastic_depth,
            stochastic_depth_p=stochastic_depth_p,
            use_cer=use_cer, sample_rate=sample_rate,
            n_mels=n_mels, t_mask_ratio=t_mask_ratio, f_mask=f_mask,
            mask_times=mask_times, t_stretch=t_stretch, lr=lr,
            optimizer=optimizer,
            schedule=schedule, schedule_conf=schedule_conf,
            clip_norm=clip_norm, routed_optim=routed_optim,
            freeze_featurizer_epoch=freeze_featurizer_epoch,
            freeze_transformer_epoch=freeze_transformer_epoch,
            keep_train_lang=keep_train_lang, dtype=dtype, remat=remat,
            scan_blocks=scan_blocks, quant_dot=quant_dot,
            ssl_conv_impl=ssl_conv_impl,
        )
        self.lang2vocab = lang2vocab
        self.lang2index = lang2index
        self.index2lang = {v: k for k, v in lang2index.items()}
        self.tokenizers = tokenizers or {}
        self.n_lang = len(lang2vocab)
        # vocab sizes ordered by language index
        ordered = sorted(lang2index, key=lang2index.get)
        self.vocab_sizes = tuple(lang2vocab[l] for l in ordered)
        self.ordered_langs = ordered

        self.sample_rate = sample_rate
        self.hop = int(sample_rate * 0.01)
        self.n_mels = n_mels
        self.t_mask_ratio = t_mask_ratio
        self.f_mask = f_mask
        self.mask_times = mask_times
        self.t_stretch = t_stretch
        self.lr = lr
        self.optimizer = optimizer
        self.schedule = schedule
        self.schedule_conf = schedule_conf or {}
        self.clip_norm = clip_norm
        self.routed_optim = routed_optim
        self.freeze_featurizer_epoch = freeze_featurizer_epoch
        self.freeze_transformer_epoch = freeze_transformer_epoch
        self.keep_train_lang = keep_train_lang
        self.use_cer = use_cer

        self.featurizer_kind = featurizer
        self.pt_path = pt_path
        import jax.numpy as _jnp

        self.dtype = getattr(_jnp, dtype)
        if featurizer == "conformer":
            feat_module = ConformerModel(
                n_blocks=n_blocks, n_mels=n_mels, encoder_dim=encoder_dim,
                heads=heads, dim_head=dim_head, sub_sampling=sub_sampling,
                use_double_swish=double_swish, remat=remat,
                scan_blocks=scan_blocks, dtype=self.dtype,
                pos_dropout=pos_dropout,
                use_stochastic_depth=use_stochastic_depth,
                stochastic_depth_p=stochastic_depth_p,
                quant_dot=quant_dot,
            )
        elif featurizer in ("wavlm", "wav2vec2"):
            from speechlid_tpu.models.wav2vec2 import (
                SSLFeaturizerModel,
                wav2vec2_config,
            )
            from speechlid_tpu.models.wavlm import WavLMConfig

            if pt_path:
                if featurizer == "wavlm":
                    from speechlid_tpu.models.wavlm import load_wavlm_checkpoint

                    self._ssl_params, ssl_cfg = load_wavlm_checkpoint(pt_path)
                else:
                    from speechlid_tpu.models.wav2vec2 import (
                        load_fairseq_wav2vec2_checkpoint,
                    )

                    self._ssl_params, ssl_cfg = (
                        load_fairseq_wav2vec2_checkpoint(pt_path)
                    )
            else:
                self._ssl_params = None
                conf = dict(ssl_config or {})
                ssl_cfg = (
                    WavLMConfig.from_dict(conf)
                    if featurizer == "wavlm"
                    else wav2vec2_config(**conf)
                )
            # SSL training-time masking is governed by the config's
            # mask_prob / mask_channel_prob (reference overrides them at
            # lid/wavlm/example.py:26-28)
            if quant_dot or ssl_conv_impl:
                import dataclasses as _dc

                ssl_cfg = _dc.replace(
                    ssl_cfg,
                    quant_dot=quant_dot,
                    conv_extractor_impl=ssl_conv_impl
                    or ssl_cfg.conv_extractor_impl,
                )
            feat_module = SSLFeaturizerModel(
                scan_layers=scan_blocks,
                config=ssl_cfg, feature_selection=feature_selection,
                remat=remat,
            )
            encoder_dim = ssl_cfg.encoder_embed_dim
            linear_dim = encoder_dim
        else:
            raise ValueError(f"unknown featurizer: {featurizer}")
        self.model = MutiLangModel(
            featurizer=feat_module,
            vocab_sizes=self.vocab_sizes,
            head_type=head_type,
            linear_dim=encoder_dim,
            num_layers=head_layers,
            dropout=dropout,
            dim_head=head_dim_head,
            num_head=head_num_head,
            use_double_swish=double_swish,
            dtype=self.dtype,
            quant_dot=quant_dot,
        )
        self.eer = EER(num_class=self.n_lang)
        self.cavg = CAvg(num_class=self.n_lang)
        # ground-truth-target variants: the reference scores EER/Cavg against
        # the model's own argmax (LidModule_ASR.py:357-358), which is blind
        # to systematic LID errors; these score against the true label so
        # checkpoint selection can see them.
        self.eer_true = EER(num_class=self.n_lang)
        self.cavg_true = CAvg(num_class=self.n_lang)
        self.err_fn = CharErrorRate() if use_cer else WordErrorRate()

    # -------------------------------------------------------------- frontend
    def _model_inputs(self, wavs, wav_lengths, rngs=None):
        """Featurizer input: fbank for the conformer path, normalized wav
        for SSL upstreams (their conv extractor IS the frontend)."""
        if self.featurizer_kind == "conformer":
            return self._features(wavs, wav_lengths, rngs)
        return normalize_wav(wavs, wav_lengths), wav_lengths

    def _features(self, wavs, wav_lengths, rngs=None):
        return fused_frontend(
            wavs, wav_lengths,
            key=rngs["specaug"] if rngs is not None else None,
            sample_rate=self.sample_rate,
            n_mels=self.n_mels,
            t_stretch=self.t_stretch,
            mask_times=self.mask_times,
            t_mask_ratio=self.t_mask_ratio,
            f_mask=self.f_mask,
        )  # ((B, F, n_mels), frame lengths)

    # ----------------------------------------------------------------- setup
    def init_variables(self, rng, sample_batch):
        # Init on the CPU backend: params are device-agnostic, this skips a
        # multi-minute remote compile of the full init graph on the tunneled
        # TPU, and — critically — avoids running the frontend EAGERLY on
        # the accelerator, which destabilizes the axon worker for later
        # train graphs (docs/runs/CHIP_FINDINGS_r2.md).  The trainer places
        # the returned pytree on the target device afterwards.
        def _init(wavs, lengths, rng):
            feats, f_len = self._model_inputs(wavs, lengths)
            return self.model.init(
                {"params": rng, "dropout": rng, "stochastic_depth": rng},
                feats, f_len, method=MutiLangModel.infer,
            )

        variables = jax.jit(_init, backend="cpu")(
            jnp.asarray(sample_batch["wavs"]),
            jnp.asarray(sample_batch["wav_lengths"]),
            rng,
        )
        if getattr(self, "_ssl_params", None):
            # warm-start the SSL upstream from the converted torch ckpt
            variables = dict(variables)
            params = dict(variables["params"])
            feat_params = dict(params["featurizer"])
            feat_params["upstream"] = self._ssl_params
            params["featurizer"] = feat_params
            variables["params"] = params
        return variables

    def config_optim(self):
        sched_conf = dict(self.schedule_conf)
        tx, plateau = make_optimizer(
            self.optimizer, lr=self.lr, clip_norm=self.clip_norm,
            schedule=self.schedule, schedule_conf=sched_conf,
            routed=self.routed_optim,
        )
        return tx, plateau

    def route_mask(self, params, batch):
        """Per-batch hard-routing mask for ``routed_adam`` (traced).

        Language-homogeneous batches route to exactly one head row: the
        ``heads`` subtree gets a one-hot (L, 1, …) mask at the batch's
        language, everything else (featurizer, discriminator) a scalar 1 —
        mirroring which grads torch leaves non-None in the reference
        (ConformerLangModel.py:275-280 runs only ``res[lang]``)."""
        n_lang = len(self.vocab_sizes)
        onehot = (
            jnp.arange(n_lang) == batch["langs"][0]
        ).astype(jnp.float32)

        def leaf(path, p):
            key0 = getattr(path[0], "key", str(path[0]))
            if key0 == "heads":
                return onehot.reshape((n_lang,) + (1,) * (p.ndim - 1))
            return jnp.ones((), jnp.float32)

        return jax.tree_util.tree_map_with_path(leaf, params)

    # ----------------------------------------------------------- device loops
    def _forward_ctc(self, variables, batch, rngs, deterministic):
        feats, f_len = self._model_inputs(
            batch["wavs"], batch["wav_lengths"],
            rngs=None if deterministic else rngs,
        )
        if deterministic:
            (logits, feat_lens) = self.model.apply(
                variables, feats, f_len, deterministic=True
            )
            mut = {}
        else:
            (logits, feat_lens), mut = self.model.apply(
                variables, feats, f_len, deterministic=False,
                rngs=rngs, mutable=["batch_stats"],
            )
            # Per-language BN semantics (reference parity): the reference
            # runs ONLY the batch's own head in training
            # (ConformerLangModel.py:275-280 `res[lang] = …`), so the other
            # heads' BatchNorm running stats never see this batch.  Our
            # vmap computes every head in one graph — keep the numerics but
            # commit only the own-language slice of the heads' stats
            # (leading axis = language).
            mut = dict(mut)
            new_stats = dict(mut.get("batch_stats", {}))
            if "heads" in new_stats and "langs" in batch:
                lang = batch["langs"][0]  # language-homogeneous batches
                old_heads = variables["batch_stats"]["heads"]
                n_lang = len(self.vocab_sizes)
                sel = (jnp.arange(n_lang) == lang)

                def commit_own(new, old):
                    keep = sel.reshape((n_lang,) + (1,) * (new.ndim - 1))
                    return jnp.where(keep, new, old)

                new_stats["heads"] = jax.tree_util.tree_map(
                    commit_own, new_stats["heads"], old_heads
                )
                mut["batch_stats"] = new_stats
        # each utterance's own language head: (L, B, T, V) → (B, T, V)
        own = jnp.take_along_axis(
            logits, batch["langs"][None, :, None, None], axis=0
        )[0]
        lp = jax.nn.log_softmax(own, axis=-1)
        # reference loss semantics: CTCLoss(reduction='none') then a plain
        # batch mean of the UNNORMALIZED per-sample NLLs
        # (LidModule_ASR.py:185-191, LidModule_ASR_Supervised.py:160-167) —
        # NOT torch's default label-length-normalized 'mean'.  The scale
        # difference (×mean label length) changes the effective lr, so this
        # is a training-fidelity requirement, not cosmetics.
        loss = ctc_loss(
            lp, batch["texts"], feat_lens, batch["text_lengths"], blank=-1,
            reduction="none",
        ).mean()
        return loss, logits, lp, feat_lens, mut

    def train_loop(self, variables, batch, rngs):
        loss, _, _, _, mut = self._forward_ctc(variables, batch, rngs, False)
        return loss, {}, dict(mut)

    def bn_update_loop(self, variables, batch, seed=0):
        """SWA BN re-estimation hook (Trainer._finalize_swa): one
        train-mode forward, return refreshed batch_stats (reference
        trainer.py:647-665 replays train batches after weight swap).
        ``seed`` varies per batch so augmentation/dropout draws differ
        across the pass instead of repeating one corruption pattern."""
        base = jax.random.PRNGKey(0)
        rngs = {
            k: jax.random.fold_in(jax.random.fold_in(base, i), seed)
            for i, k in enumerate(self.rng_keys) if k != "params"
        }
        _, _, _, _, mut = self._forward_ctc(variables, batch, rngs, False)
        return dict(mut)["batch_stats"]

    def val_loop(self, variables, batch):
        loss, logits, lp, feat_lens, _ = self._forward_ctc(
            variables, batch, None, True
        )
        scores = lang_confidence_scores(
            logits, jnp.asarray(self.vocab_sizes), feat_lens
        )  # (B, L)
        pred_ids = jnp.argmax(lp, axis=-1).astype(jnp.int32)
        out = {
            "loss": loss,
            "scores": scores,
            "pred_ids": pred_ids,
            "feat_lens": feat_lens,
            "langs": batch["langs"],
            "texts": batch["texts"],
            "text_lengths": batch["text_lengths"],
        }
        if "n_valid" in batch:  # repeat-padded partial batches
            out["n_valid"] = batch["n_valid"]
        return out

    # ------------------------------------------------------------- host hooks
    def before_train_loop(self, epoch: int):
        if self.trainer is None:
            return None
        freeze_feat = epoch <= self.freeze_featurizer_epoch
        freeze_trans = epoch <= self.freeze_transformer_epoch
        keep_lang = self.keep_train_lang
        if not freeze_feat and not freeze_trans and keep_lang is None:
            # numpy scalars: mask building must not issue eager device ops
            # (axon worker stability — docs/runs/CHIP_FINDINGS_r2.md)
            return jax.tree_util.tree_map(
                lambda _: np.ones((), np.float32), self.trainer.state.params
            )
        keep_idx = None if keep_lang is None else self.lang2index[keep_lang]

        def mask_leaf(path, leaf):
            keys = "/".join(
                getattr(p, "key", str(p)) for p in path
            )
            if freeze_feat and keys.startswith("featurizer"):
                # SSL: freeze the conv extractor AND post_extract_proj
                # (reference freeze_feature_extractor,
                # lid/WavLMMutiLangModel.py:81-84); conformer: whole
                # featurizer
                if self.featurizer_kind == "conformer" or (
                    "feature_extractor" in keys
                    or "post_extract_proj" in keys
                ):
                    return np.zeros((), np.float32)
            if freeze_trans and keys.startswith("featurizer") and any(
                part in keys
                for part in ("layers_", "pos_conv", "encoder_layer_norm")
            ):
                return np.zeros((), np.float32)
            # stacked heads: leading axis L — freeze all but keep_idx by a
            # per-language broadcastable vector mask
            if keep_idx is not None and keys.startswith("heads"):
                m = np.zeros((leaf.shape[0],), np.float32)
                m[keep_idx] = 1.0
                return m.reshape((-1,) + (1,) * (leaf.ndim - 1))
            return np.ones((), np.float32)

        logging.info(
            "freeze schedule: featurizer_frozen=%s keep_train_lang=%s",
            freeze_feat, keep_lang,
        )
        return jax.tree_util.tree_map_with_path(
            mask_leaf, self.trainer.state.params
        )

    def val_loop_end(self, outputs: List[Dict]) -> Dict[str, float]:
        losses, correct, total = [], 0, 0
        self.err_fn.reset()
        for out in outputs:
            scores = np.asarray(out["scores"])  # (B, L)
            langs = np.asarray(out["langs"])
            # slice away repeat-padded duplicate rows (partial batches are
            # padded for shape stability — feeder.Batch.n_valid)
            nv = int(out.get("n_valid", 0)) or len(langs)
            scores, langs = scores[:nv], langs[:nv]
            if np.isfinite(out["loss"]):
                losses.append(out["loss"])
            prob = normalize_scores(scores)
            pred = prob.argmax(axis=-1)
            # reference updates EER/Cavg with predicted lang as "target"
            # (LidModule_ASR.py:357-358) — scored against the model's own
            # argmax; accuracy uses the true label
            self.eer.update(prob, pred)
            self.cavg.update(prob, pred)
            self.eer_true.update(prob, langs)
            self.cavg_true.update(prob, langs)
            correct += int((pred == langs).sum())
            total += len(langs)
            # CER/WER via host decode with the right language's tokenizer
            if self.tokenizers:
                pred_ids = np.asarray(out["pred_ids"])[:nv]
                feat_lens = np.asarray(out["feat_lens"])[:nv]
                texts = np.asarray(out["texts"])[:nv]
                text_lens = np.asarray(out["text_lengths"])[:nv]
                for i in range(len(langs)):
                    lang = self.index2lang[int(langs[i])]
                    tok = self.tokenizers.get(lang)
                    if tok is None:
                        continue
                    hyp = tok.ctc_decode(
                        pred_ids[i : i + 1], [int(feat_lens[i])],
                        blank_id=max(self.vocab_sizes),  # global padded blank
                    )[0]
                    ref = tok.decoder(
                        texts[i : i + 1], [int(text_lens[i])]
                    )[0]
                    self.err_fn.update([hyp], [ref])
        # multi-host: aggregate metric state across processes before compute
        # (reference dist_reduce_fx="cat" on EER/CAvg, lid/eer.py:47-48,74;
        # torchmetrics count-sum on CER/WER) — no-op single-process
        if jax.process_count() > 1:
            for m in (self.eer, self.cavg, self.eer_true, self.cavg_true,
                      self.err_fn):
                m.sync()
            from speechlid_tpu.metrics.dist import allreduce_sum_counts

            # the loss is the CkptCallback monitor — it must be the GLOBAL
            # mean or ranks disagree on which checkpoint is best
            loss_sum, loss_n, correct, total = (
                allreduce_sum_counts(float(np.sum(losses)), len(losses),
                                     correct, total)
            )
            losses = [loss_sum / loss_n] if loss_n else []
            correct, total = int(correct), int(total)
        multi = self.n_lang > 1  # LID metrics degenerate for pure ASR
        result = {
            "avg_val_loss": float(np.mean(losses)) if losses else float("nan"),
            "val_acc": correct / max(total, 1),
            "val_wer": self.err_fn.compute(),
            "eer": self.eer.compute() if (total and multi) else float("nan"),
            "cavg": self.cavg.compute() if (total and multi) else float("nan"),
            "eer_true": (
                self.eer_true.compute() if (total and multi) else float("nan")
            ),
            "cavg_true": (
                self.cavg_true.compute() if (total and multi) else float("nan")
            ),
        }
        self.eer.reset()
        self.cavg.reset()
        self.eer_true.reset()
        self.cavg_true.reset()
        logging.info("val: %s", result)
        return result

    # ---------------------------------------------------------------- infer
    def infer_fn(self):
        """jittable all-language inference (reference LidModule.infer)."""

        def fn(variables, wavs, wav_lengths):
            feats, f_len = self._model_inputs(wavs, wav_lengths)
            return self.model.apply(
                variables, feats, f_len, method=MutiLangModel.infer
            )

        return fn

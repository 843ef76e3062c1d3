"""Direct cross-entropy LID classification task.

Rebuild of lid/LidModule_Cross_Entropy.py (LidModuleCross): fbank features →
classifier backend (x-vector / resnet / linear, models/classifier.py) → CE +
accuracy; eval additionally feeds softmax probability vectors to EER/CAvg
(the scoring convention of lid/test_cross.py:37-58).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speechlid_tpu.core.module import TaskModule
from speechlid_tpu.core.optim import make_optimizer
from speechlid_tpu.metrics import Accuracy, CAvg, EER
from speechlid_tpu.models.classifier import LidClassifier
from speechlid_tpu.ops.frontend import (
    frame_lengths,
    fused_frontend,
    normalize_wav,
    wav2mel,
)


class LidCrossEntropyTask(TaskModule):
    rng_keys = ("dropout", "specaug", "params", "mask", "mask_channel",
                "layerdrop")  # layerdrop: WavLM encoder_layerdrop > 0

    def __init__(
        self,
        num_classes: int = 3,
        backend: str = "xvector",  # xvector|linear|resnet2|resnet34|resnet101|xvector2
        # 'fbank' (reference LidModel) or SSL upstream features
        # (reference PretrainLidModel, lid/PretrainLidModel.py:1-105)
        featurizer: str = "fbank",
        pt_path: Optional[str] = None,
        feature_selection: str = "last_hidden_state",
        ssl_config: Optional[Dict] = None,
        freeze_upstream: bool = True,
        sample_rate: int = 16000,
        n_mels: int = 80,
        mask_times: int = 2,
        t_mask_ratio: float = 0.05,
        f_mask: int = 27,
        t_stretch: bool = False,
        lr: float = 1e-3,
        optimizer: str = "adam",
        schedule: Optional[str] = None,
        schedule_conf: Optional[Dict] = None,
        clip_norm: float = 20.0,
        **extra: Any,
    ) -> None:
        super().__init__()
        self.save_hyper_parameters(
            num_classes=num_classes, backend=backend, featurizer=featurizer,
            pt_path=pt_path, feature_selection=feature_selection,
            ssl_config=ssl_config, freeze_upstream=freeze_upstream,
            sample_rate=sample_rate,
            n_mels=n_mels, mask_times=mask_times, t_mask_ratio=t_mask_ratio,
            f_mask=f_mask, t_stretch=t_stretch, lr=lr, optimizer=optimizer,
            schedule=schedule,
            schedule_conf=schedule_conf, clip_norm=clip_norm,
        )
        self.num_classes = num_classes
        self.sample_rate = sample_rate
        self.hop = int(sample_rate * 0.01)
        self.n_mels = n_mels
        self.mask_times = mask_times
        self.t_mask_ratio = t_mask_ratio
        self.f_mask = f_mask
        self.t_stretch = t_stretch
        self.lr = lr
        self.optimizer = optimizer
        self.schedule = schedule
        self.schedule_conf = schedule_conf or {}
        self.clip_norm = clip_norm
        self.featurizer_kind = featurizer
        self.freeze_upstream = freeze_upstream
        self.upstream = None
        feat_dim = n_mels
        if featurizer in ("wavlm", "wav2vec2"):
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
            self.upstream = SSLFeaturizerModel(
                config=ssl_cfg, feature_selection=feature_selection
            )
            feat_dim = ssl_cfg.encoder_embed_dim
        if self.upstream is not None:
            from speechlid_tpu.models.classifier import PretrainLidClassifier

            self.model = PretrainLidClassifier(
                upstream=self.upstream, backend=backend,
                num_classes=num_classes, feat_dim=feat_dim,
            )
        else:
            self.model = LidClassifier(
                backend=backend, num_classes=num_classes, feat_dim=feat_dim
            )
        self.eer = EER(num_class=num_classes)
        self.cavg = CAvg(num_class=num_classes)
        self.acc = Accuracy()

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
        )

    def _model_inputs(self, wavs, wav_lengths, rngs=None):
        if self.featurizer_kind == "fbank":
            return self._features(wavs, wav_lengths, rngs)
        return normalize_wav(wavs, wav_lengths), wav_lengths

    def init_variables(self, rng, sample_batch):
        # CPU-backend init: see LidASRTask.init_variables (avoids eager
        # device frontend + the tunneled chip's huge init compile)
        def _init(wavs, lengths, rng):
            feats, f_len = self._model_inputs(wavs, lengths)
            return self.model.init({"params": rng}, feats, f_len)

        variables = jax.jit(_init, backend="cpu")(
            jnp.asarray(sample_batch["wavs"]),
            jnp.asarray(sample_batch["wav_lengths"]),
            rng,
        )
        if getattr(self, "_ssl_params", None):
            variables = dict(variables)
            params = dict(variables["params"])
            up = dict(params["upstream"])
            up["upstream"] = self._ssl_params
            params["upstream"] = up
            variables["params"] = params
        return variables

    def before_train_loop(self, epoch: int):
        if self.trainer is None or self.upstream is None:
            return None
        if not self.freeze_upstream:
            return None

        def mask_leaf(path, leaf):
            keys = "/".join(getattr(p, "key", str(p)) for p in path)
            frozen = keys.startswith("upstream")
            # numpy scalars, NOT jnp: eager per-leaf device ops destabilize
            # the axon worker (same fix as lid_asr.before_train_loop)
            return np.asarray(0.0 if frozen else 1.0, np.float32)

        return jax.tree_util.tree_map_with_path(
            mask_leaf, self.trainer.state.params
        )

    def config_optim(self):
        return make_optimizer(
            self.optimizer, lr=self.lr, clip_norm=self.clip_norm,
            schedule=self.schedule, schedule_conf=dict(self.schedule_conf),
        )

    def train_loop(self, variables, batch, rngs):
        feats, f_len = self._model_inputs(
            batch["wavs"], batch["wav_lengths"], rngs=rngs
        )
        logits, mut = self.model.apply(
            variables, feats, f_len, train=True,
            rngs=rngs, mutable=["batch_stats"],
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["langs"]
        ).mean()
        acc = jnp.mean(jnp.argmax(logits, -1) == batch["langs"])
        return loss, {"acc": acc}, dict(mut)

    def val_loop(self, variables, batch):
        feats, f_len = self._model_inputs(batch["wavs"], batch["wav_lengths"])
        logits = self.model.apply(variables, feats, f_len)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["langs"]
        ).mean()
        out = {
            "loss": loss,
            "probs": jax.nn.softmax(logits, axis=-1),
            "langs": batch["langs"],
        }
        if "n_valid" in batch:  # repeat-padded partial batches
            out["n_valid"] = batch["n_valid"]
        return out

    def val_loop_end(self, outputs: List[Dict]) -> Dict[str, float]:
        losses = []
        self.acc.reset()
        for out in outputs:
            if np.isfinite(out["loss"]):
                losses.append(out["loss"])
            probs = np.asarray(out["probs"])
            langs = np.asarray(out["langs"])
            # slice away repeat-padded duplicate rows (feeder n_valid)
            nv = int(out.get("n_valid", 0)) or len(langs)
            probs, langs = probs[:nv], langs[:nv]
            self.eer.update(probs, langs)
            self.cavg.update(probs, langs)
            self.acc.update(probs, langs)
        # multi-host: aggregate metric state across processes before compute
        # (reference dist_reduce_fx="cat", lid/eer.py:47-48,74)
        if jax.process_count() > 1:
            for m in (self.eer, self.cavg, self.acc):
                m.sync()
            from speechlid_tpu.metrics.dist import allreduce_sum_counts

            # global-mean loss: it is the checkpoint monitor
            loss_sum, loss_n = allreduce_sum_counts(
                float(np.sum(losses)), len(losses)
            )
            losses = [loss_sum / loss_n] if loss_n else []
        result = {
            "avg_val_loss": float(np.mean(losses)) if losses else float("nan"),
            "val_acc": self.acc.compute(),
            "eer": self.eer.compute() if self.acc.total else float("nan"),
            "cavg": self.cavg.compute() if self.acc.total else float("nan"),
        }
        self.eer.reset()
        self.cavg.reset()
        self.acc.reset()
        logging.info("val: %s", result)
        return result

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
from speechlid_tpu.ops.frontend import frame_lengths, normalize_wav, wav2mel
from speechlid_tpu.ops.specaugment import spec_augment


class LidCrossEntropyTask(TaskModule):
    rng_keys = ("dropout", "specaug", "params")

    def __init__(
        self,
        num_classes: int = 3,
        backend: str = "xvector",  # xvector|linear|resnet2|resnet34|resnet101|xvector2
        sample_rate: int = 16000,
        n_mels: int = 80,
        mask_times: int = 2,
        t_mask_ratio: float = 0.05,
        f_mask: int = 27,
        lr: float = 1e-3,
        optimizer: str = "adam",
        schedule: Optional[str] = None,
        schedule_conf: Optional[Dict] = None,
        clip_norm: float = 20.0,
        **extra: Any,
    ) -> None:
        super().__init__()
        self.save_hyper_parameters(
            num_classes=num_classes, backend=backend, sample_rate=sample_rate,
            n_mels=n_mels, mask_times=mask_times, t_mask_ratio=t_mask_ratio,
            f_mask=f_mask, lr=lr, optimizer=optimizer, schedule=schedule,
            schedule_conf=schedule_conf, clip_norm=clip_norm,
        )
        self.num_classes = num_classes
        self.sample_rate = sample_rate
        self.hop = int(sample_rate * 0.01)
        self.n_mels = n_mels
        self.mask_times = mask_times
        self.t_mask_ratio = t_mask_ratio
        self.f_mask = f_mask
        self.lr = lr
        self.optimizer = optimizer
        self.schedule = schedule
        self.schedule_conf = schedule_conf or {}
        self.clip_norm = clip_norm
        self.model = LidClassifier(
            backend=backend, num_classes=num_classes, feat_dim=n_mels
        )
        self.eer = EER(num_class=num_classes)
        self.cavg = CAvg(num_class=num_classes)
        self.acc = Accuracy()

    def _features(self, wavs, wav_lengths, rngs=None):
        x = normalize_wav(wavs, wav_lengths)
        mel = wav2mel(
            x, sample_rate=self.sample_rate, n_mels=self.n_mels,
            lengths=wav_lengths,
        )
        f_len = frame_lengths(wav_lengths, self.hop)
        if rngs is not None and self.mask_times > 0:
            mel = spec_augment(
                rngs["specaug"], mel,
                time_mask_ratio=self.t_mask_ratio,
                freq_mask_param=self.f_mask,
                n_time_masks=self.mask_times,
                n_freq_masks=self.mask_times,
                lengths=f_len,
            )
        return jnp.transpose(mel, (0, 2, 1)), f_len

    def init_variables(self, rng, sample_batch):
        feats, f_len = self._features(
            jnp.asarray(sample_batch["wavs"]),
            jnp.asarray(sample_batch["wav_lengths"]),
        )
        return self.model.init({"params": rng}, feats, f_len)

    def config_optim(self):
        return make_optimizer(
            self.optimizer, lr=self.lr, clip_norm=self.clip_norm,
            schedule=self.schedule, schedule_conf=dict(self.schedule_conf),
        )

    def train_loop(self, variables, batch, rngs):
        feats, f_len = self._features(
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
        feats, f_len = self._features(batch["wavs"], batch["wav_lengths"])
        logits = self.model.apply(variables, feats, f_len)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["langs"]
        ).mean()
        return {
            "loss": loss,
            "probs": jax.nn.softmax(logits, axis=-1),
            "langs": batch["langs"],
        }

    def val_loop_end(self, outputs: List[Dict]) -> Dict[str, float]:
        losses = []
        self.acc.reset()
        for out in outputs:
            if np.isfinite(out["loss"]):
                losses.append(out["loss"])
            probs = np.asarray(out["probs"])
            langs = np.asarray(out["langs"])
            self.eer.update(probs, langs)
            self.cavg.update(probs, langs)
            self.acc.update(probs, langs)
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

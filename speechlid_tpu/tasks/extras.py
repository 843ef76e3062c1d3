"""Secondary task agents validating the framework beyond LID
(reference: mnist/mnist_module.py, lm/lm_agent.py, rml/RMLModule.py,
spec_pred/agent_module.py — all on the same ccml contract)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speechlid_tpu.core.module import TaskModule
from speechlid_tpu.core.optim import make_optimizer
from speechlid_tpu.models.extras import (
    FORECAST_MODELS,
    BaseCNN,
    LSTMLM,
    ResNet1D,
)


class ImageClassificationTask(TaskModule):
    """mnist framework smoke (reference mnist/mnist_module.py):
    batch = (images (B,H,W,C), labels)."""

    rng_keys = ("dropout",)

    def __init__(self, num_classes: int = 10, lr: float = 1e-3,
                 optimizer: str = "adam", **kw: Any):
        super().__init__()
        self.save_hyper_parameters(num_classes=num_classes, lr=lr,
                                   optimizer=optimizer)
        self.lr = lr
        self.optimizer = optimizer
        self.model = BaseCNN(num_classes=num_classes)

    def init_variables(self, rng, batch):
        x, _ = batch
        return self.model.init({"params": rng}, jnp.asarray(x[:1]))

    def config_optim(self):
        return make_optimizer(self.optimizer, lr=self.lr, clip_norm=20.0)

    def train_loop(self, variables, batch, rngs):
        x, y = batch
        logits = self.model.apply(variables, x, train=True, rngs=rngs)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        acc = jnp.mean(jnp.argmax(logits, -1) == y)
        return loss, {"acc": acc}, {}

    def val_loop(self, variables, batch):
        x, y = batch
        logits = self.model.apply(variables, x)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        return {"loss": loss, "acc": jnp.mean(jnp.argmax(logits, -1) == y)}


class LMTask(TaskModule):
    """Word-level LSTM LM (reference lm/lm_agent.py): next-word CE with
    per-sample PPL and BPC over valid positions."""

    rng_keys = ("dropout",)

    def __init__(self, vocab_size: int, embedding_dim: int = 128,
                 hidden_size: int = 256, num_layers: int = 1,
                 dropout: float = 0.0, lr: float = 1e-3,
                 optimizer: str = "adam", **kw: Any):
        super().__init__()
        self.save_hyper_parameters(
            vocab_size=vocab_size, embedding_dim=embedding_dim,
            hidden_size=hidden_size, num_layers=num_layers, dropout=dropout,
            lr=lr, optimizer=optimizer,
        )
        self.lr = lr
        self.optimizer = optimizer
        self.model = LSTMLM(
            vocab_size=vocab_size, embedding_dim=embedding_dim,
            hidden_size=hidden_size, num_layers=num_layers, dropout=dropout,
        )

    def init_variables(self, rng, batch):
        return self.model.init(
            {"params": rng}, jnp.asarray(batch["ids"]),
            jnp.asarray(batch["lengths"]),
        )

    def config_optim(self):
        return make_optimizer(self.optimizer, lr=self.lr, clip_norm=20.0)

    def _loop(self, variables, batch, rngs, deterministic):
        ids, lengths = batch["ids"], batch["lengths"]
        out = self.model.apply(
            variables, ids, lengths, deterministic=deterministic,
            rngs=rngs or {},
        )
        # predict token t+1 from position t over the valid prefix
        logits = out[:, :-1, :]
        targets = ids[:, 1:]
        lp = jax.nn.log_softmax(logits, axis=-1)
        tgt_lp = jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
        pos = jnp.arange(targets.shape[1])[None, :]
        valid = pos < (lengths - 1)[:, None]
        n = jnp.maximum(jnp.sum(valid, axis=1), 1)
        per_utt_nll = -jnp.sum(jnp.where(valid, tgt_lp, 0.0), axis=1) / n
        loss = jnp.mean(per_utt_nll)
        ppl = jnp.mean(jnp.exp(per_utt_nll))
        bpc = jnp.mean(per_utt_nll / jnp.log(2.0))
        return loss, ppl, bpc

    def train_loop(self, variables, batch, rngs):
        loss, ppl, bpc = self._loop(variables, batch, rngs, False)
        return loss, {"ppl": ppl, "bpc": bpc}, {}

    def val_loop(self, variables, batch):
        loss, ppl, bpc = self._loop(variables, batch, None, True)
        return {"loss": loss, "ppl": ppl, "bpc": bpc}


class RMLTask(TaskModule):
    """Radio modulation classification (reference rml/RMLModule.py):
    (B, T, 2) IQ → ResNet1D; optional SNR auxiliary regression loss
    weighted by ``snr_loss_weight`` (rml/main.py use_snr_info)."""

    rng_keys = ("dropout",)

    def __init__(self, n_classes: int = 11, base_filters: int = 32,
                 kernel_size: int = 16, n_blocks: int = 6,
                 use_rnn: bool = False, use_snr_info: bool = False,
                 snr_loss_weight: float = 0.1, lr: float = 1e-3,
                 optimizer: str = "adam", **kw: Any):
        super().__init__()
        self.save_hyper_parameters(
            n_classes=n_classes, base_filters=base_filters,
            kernel_size=kernel_size, n_blocks=n_blocks, use_rnn=use_rnn,
            use_snr_info=use_snr_info, snr_loss_weight=snr_loss_weight,
            lr=lr, optimizer=optimizer,
        )
        self.lr = lr
        self.optimizer = optimizer
        self.use_snr_info = use_snr_info
        self.snr_loss_weight = snr_loss_weight
        self.model = ResNet1D(
            n_classes=n_classes, base_filters=base_filters,
            kernel_size=kernel_size, n_blocks=n_blocks, use_rnn=use_rnn,
            use_snr_head=use_snr_info,
        )

    def init_variables(self, rng, batch):
        return self.model.init({"params": rng}, jnp.asarray(batch["iq"][:1]))

    def config_optim(self):
        return make_optimizer(self.optimizer, lr=self.lr, clip_norm=20.0)

    def _forward(self, variables, batch, rngs, train):
        kwargs = dict(train=train)
        if train:
            out, mut = self.model.apply(
                variables, batch["iq"], mutable=["batch_stats"],
                rngs=rngs, **kwargs,
            )
        else:
            out, mut = self.model.apply(variables, batch["iq"], **kwargs), {}
        if self.use_snr_info:
            logits, snr_pred = out
        else:
            logits, snr_pred = out, None
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["label"]
        ).mean()
        if snr_pred is not None and "snr" in batch:
            loss = loss + self.snr_loss_weight * jnp.mean(
                (snr_pred - batch["snr"]) ** 2
            )
        acc = jnp.mean(jnp.argmax(logits, -1) == batch["label"])
        return loss, acc, dict(mut)

    def train_loop(self, variables, batch, rngs):
        loss, acc, mut = self._forward(variables, batch, rngs, True)
        return loss, {"acc": acc}, mut

    def val_loop(self, variables, batch):
        loss, acc, _ = self._forward(variables, batch, None, False)
        return {"loss": loss, "acc": acc}


def sliding_windows(
    series: np.ndarray, win_len: int, normalize: bool = True
):
    """(T, D) series → ((N, win_len, D) inputs, (N, D) next-frame targets)
    with optional global standardization (spec_pred/spec_dataset.py)."""
    mean = series.mean(0) if normalize else 0.0
    std = series.std(0) + 1e-9 if normalize else 1.0
    z = (series - mean) / std
    xs, ys = [], []
    for i in range(len(z) - win_len):
        xs.append(z[i : i + win_len])
        ys.append(z[i + win_len])
    return (
        np.asarray(xs, np.float32), np.asarray(ys, np.float32),
        np.asarray(mean, np.float32), np.asarray(std, np.float32),
    )


class SpecPredTask(TaskModule):
    """Spectrum time-series forecasting (reference spec_pred/agent_module.py):
    sliding window → next frame, L1 or L2 loss; autoregressive ``infer``
    rolls predictions forward and de-normalizes."""

    rng_keys = ("dropout",)

    def __init__(self, model_name: str = "mlp", feat_dim: int = 64,
                 win_len: int = 32, loss_type: str = "l2",
                 lr: float = 1e-3, optimizer: str = "adam",
                 model_conf: Optional[Dict] = None, **kw: Any):
        super().__init__()
        self.save_hyper_parameters(
            model_name=model_name, feat_dim=feat_dim, win_len=win_len,
            loss_type=loss_type, lr=lr, optimizer=optimizer,
            model_conf=model_conf,
        )
        self.lr = lr
        self.optimizer = optimizer
        self.loss_type = loss_type
        self.win_len = win_len
        self.mean = 0.0
        self.std = 1.0
        self.model = FORECAST_MODELS[model_name](
            out_dim=feat_dim, **(model_conf or {})
        )

    def set_normalization(self, mean, std):
        self.mean, self.std = np.asarray(mean), np.asarray(std)

    def init_variables(self, rng, batch):
        return self.model.init({"params": rng}, jnp.asarray(batch["x"][:1]))

    def config_optim(self):
        return make_optimizer(self.optimizer, lr=self.lr, clip_norm=20.0)

    def _loss(self, pred, target):
        if self.loss_type == "l1":
            return jnp.mean(jnp.abs(pred - target))
        return jnp.mean((pred - target) ** 2)

    def train_loop(self, variables, batch, rngs):
        pred = self.model.apply(variables, batch["x"], train=True, rngs=rngs)
        loss = self._loss(pred, batch["y"])
        return loss, {}, {}

    def val_loop(self, variables, batch):
        pred = self.model.apply(variables, batch["x"])
        return {
            "loss": self._loss(pred, batch["y"]),
            "l1": jnp.mean(jnp.abs(pred - batch["y"])),
        }

    def infer(self, variables, x: np.ndarray, pred_len: int) -> np.ndarray:
        """Autoregressive rollout (agent_module.py:131-146): (B, T≥win, D)
        normalized input → (B, pred_len, D) de-normalized predictions."""
        apply = jax.jit(lambda v, w: self.model.apply(v, w))
        x = jnp.asarray(x)
        outs = []
        for _ in range(pred_len):
            pred = apply(variables, x[:, -self.win_len :, :])
            x = jnp.concatenate([x, pred[:, None, :]], axis=1)
            outs.append(np.asarray(pred) * (1e-9 + self.std) + self.mean)
        return np.stack(outs, axis=1)

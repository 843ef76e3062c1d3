"""Speech enhancement task (reference: se/se_module.py — a stub in the
reference; here a working SI-SNR trainer for the DPRNN masker, whose
trained model plugs into the LID eval harness as ``enhance_fn``, replacing
the reference's closed-source HTTP SE service, lid/test.py:184-197)."""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from speechlid_tpu.core.module import TaskModule
from speechlid_tpu.core.optim import make_optimizer
from speechlid_tpu.models.fasnet import FaSNetTAC
from speechlid_tpu.models.se import DPRNNEnhancer, si_snr


class SETask(TaskModule):
    rng_keys = ("dropout",)

    def __init__(self, enc_dim: int = 64, win: int = 16, chunk: int = 100,
                 n_blocks: int = 2, hidden: int = 64,
                 model_type: str = "dprnn",  # dprnn | fasnet_tac
                 loss_type: str = "si_snr", lr: float = 1e-3,
                 optimizer: str = "adam", **kw: Any):
        super().__init__()
        self.save_hyper_parameters(
            enc_dim=enc_dim, win=win, chunk=chunk, n_blocks=n_blocks,
            hidden=hidden, model_type=model_type, loss_type=loss_type,
            lr=lr, optimizer=optimizer,
        )
        self.lr = lr
        self.optimizer = optimizer
        self.loss_type = loss_type
        self.model_type = model_type
        if model_type == "fasnet_tac":
            self.model = FaSNetTAC(
                enc_dim=enc_dim, feature_dim=enc_dim, hidden_dim=hidden,
                n_layers=n_blocks, segment_size=chunk, nspk=1,
            )
        else:
            self.model = DPRNNEnhancer(enc_dim=enc_dim, win=win, chunk=chunk,
                                       n_blocks=n_blocks, hidden=hidden)

    def _apply(self, variables, noisy, rngs=None):
        """Run the chosen model; FaSNet consumes (B, nmic, T) — a 2-D
        single-channel batch gains/loses the mic/speaker axes here so the
        task contract stays (B, T) → (B, T) for both models."""
        if self.model_type == "fasnet_tac":
            if noisy.ndim == 2:
                noisy = noisy[:, None, :]
            return self.model.apply(variables, noisy, rngs=rngs)[:, 0]
        return self.model.apply(variables, noisy, rngs=rngs)

    def init_variables(self, rng, batch):
        noisy = jnp.asarray(batch["noisy"][:1])
        if self.model_type == "fasnet_tac" and noisy.ndim == 2:
            noisy = noisy[:, None, :]
        return self.model.init({"params": rng}, noisy)

    def config_optim(self):
        return make_optimizer(self.optimizer, lr=self.lr, clip_norm=5.0)

    def _loss(self, est, clean):
        if self.loss_type == "l1":
            return jnp.mean(jnp.abs(est - clean))
        return -jnp.mean(si_snr(est, clean))

    def train_loop(self, variables, batch, rngs):
        est = self._apply(variables, batch["noisy"], rngs=rngs)
        loss = self._loss(est, batch["clean"])
        return loss, {"si_snr": jnp.mean(si_snr(est, batch["clean"]))}, {}

    def val_loop(self, variables, batch):
        est = self._apply(variables, batch["noisy"])
        return {
            "loss": self._loss(est, batch["clean"]),
            "si_snr": jnp.mean(si_snr(est, batch["clean"])),
        }

    def make_enhance_fn(
        self, variables, device: str = "cpu"
    ) -> Callable[[np.ndarray], np.ndarray]:
        """→ per-utterance enhance hook for eval.LidEvaluator / serving.

        Defaults to the CPU backend: the dual-path LSTM graph is scan-heavy
        (poor MXU fit) and long-input variants have faulted the experimental
        axon TPU worker; on CPU it runs fine and overlaps the accelerator,
        mirroring the reference's SE-as-a-separate-service deployment
        (lid/test.py:184-197).
        """
        try:
            dev = jax.devices(device)[0]
        except RuntimeError:
            dev = jax.devices()[0]
        # params as a jit ARG (closure constants inflate the serialized
        # program — the tunneled TPU's /remote_compile rejects huge bodies)
        apply = jax.jit(lambda v, w: self._apply(v, w))

        def enhance(wav: np.ndarray) -> np.ndarray:
            with jax.default_device(dev):
                return np.asarray(apply(variables, jnp.asarray(wav[None, :])))[0]

        return enhance

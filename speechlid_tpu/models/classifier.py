"""Direct cross-entropy LID classifier backends.

Rebuild of lid/PretrainLidModel.py's backend zoo (:106-457): the
``LidModel``/``PretrainLidModel`` agents pick one of
xvector | linear | resnet2 | resnet34 | resnet101 | xvector2 backends over
(B, T, F) features (fbank for the supervised path, SSL features for the
pretrained path).  All return raw (B, num_class) logits (no softmax).

Faithful quirks kept: the cvqluu TDNN x-vector pools mean ‖ **variance**
(not std — PretrainLidModel.py:377-379), as does LinearModel (:392-396).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechlid_tpu.models.resnet import ResNet18, ResNet34, ResNet101
from speechlid_tpu.models.xvector import XVEC


def _masked_mean_var(x: jax.Array, mask: Optional[jax.Array]):
    """(B, T, F) → mean, (unbiased) var over valid frames."""
    if mask is None:
        mean = jnp.mean(x, axis=1)
        n = x.shape[1]
        var = jnp.sum((x - mean[:, None, :]) ** 2, axis=1) / max(n - 1, 1)
    else:
        m = mask[:, :, None].astype(x.dtype)
        n = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        mean = jnp.sum(x * m, axis=1) / n
        var = jnp.sum((x - mean[:, None, :]) ** 2 * m, axis=1) / jnp.maximum(
            n - 1.0, 1.0
        )
    return mean, var


class TDNNLayerUnfold(nn.Module):
    """cvqluu TDNN layer: unfold context → Linear → ReLU → dropout
    (PretrainLidModel.py:273-343).  VALID framing like the original unfold."""

    output_dim: int = 512
    context_size: int = 5
    dilation: int = 1
    dropout_p: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # context window via dilated conv == unfold+Linear
        x = nn.Conv(
            self.output_dim,
            (self.context_size,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
        )(x)
        x = jax.nn.relu(x)
        return nn.Dropout(self.dropout_p, deterministic=deterministic)(x)

    def out_lengths(self, lengths):
        return lengths - self.dilation * (self.context_size - 1)


class TDNNXVector(nn.Module):
    """cvqluu X_vector (PretrainLidModel.py:346-385): 5 TDNNs →
    mean‖var pool → two segment Dense → class logits.
    Returns (logits, x_vec)."""

    num_classes: int = 3
    input_dim: int = 40

    _LAYERS = ((512, 5, 1), (512, 3, 1), (512, 2, 2), (512, 1, 1), (512, 1, 3))

    def out_lengths(self, lengths):
        for _, ctx, dil in self._LAYERS:
            lengths = lengths - dil * (ctx - 1)
        return lengths

    @nn.compact
    def __call__(self, x, lengths=None, deterministic: bool = True):
        for i, (dim, ctx, dil) in enumerate(self._LAYERS):
            x = TDNNLayerUnfold(dim, ctx, dil, name=f"tdnn{i + 1}")(
                x, deterministic
            )
        mask = None
        if lengths is not None:
            out_len = self.out_lengths(lengths)
            mask = jnp.arange(x.shape[1])[None, :] < out_len[:, None]
        mean, var = _masked_mean_var(x, mask)
        stats = jnp.concatenate([mean, var], axis=-1)  # (B, 1024)
        seg6 = nn.Dense(512, name="segment6")(stats)
        x_vec = nn.Dense(512, name="segment7")(seg6)
        logits = nn.Dense(self.num_classes, name="output")(x_vec)
        return logits, x_vec


class LinearModel(nn.Module):
    """mean‖var stats pooling + Linear (PretrainLidModel.py:388-399)."""

    num_classes: int = 3

    @nn.compact
    def __call__(self, x, lengths=None, deterministic: bool = True):
        mask = None
        if lengths is not None:
            mask = jnp.arange(x.shape[1])[None, :] < lengths[:, None]
        mean, var = _masked_mean_var(x, mask)
        stats = jnp.concatenate([mean, var], axis=-1)
        return nn.Dense(self.num_classes)(stats)


class PretrainLidClassifier(nn.Module):
    """SSL upstream features → classifier backend (reference
    PretrainLidModel, lid/PretrainLidModel.py:20-105: WavLM/wav2vec2
    features into x-vector/resnet/linear back-ends)."""

    upstream: nn.Module  # SSLFeaturizerModel
    backend: str = "xvector"
    num_classes: int = 3
    feat_dim: int = 768

    @nn.compact
    def __call__(self, wavs, lengths=None, train: bool = False):
        feats = self.upstream(wavs, lengths, deterministic=not train)
        f_len = (
            None if lengths is None
            else self.upstream.subsampled_lengths(lengths)
        )
        return LidClassifier(
            backend=self.backend, num_classes=self.num_classes,
            feat_dim=self.feat_dim, name="classifier",
        )(feats, f_len, train)


class LidClassifier(nn.Module):
    """Backend dispatcher (reference LidModel, PretrainLidModel.py:106-152).

    backend: 'xvector' (TDNN x-vector), 'linear', 'resnet2' (ResNet18
    MQMHASTP), 'resnet34', 'resnet101', 'xvector2' (wespeaker XVEC TSTP).
    Input (B, T, F) features → (B, num_class) logits.
    """

    backend: str = "xvector"
    num_classes: int = 3
    feat_dim: int = 80

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, T, feat_dim)
        lengths: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        det = not train
        if self.backend == "xvector":
            logits, _ = TDNNXVector(
                self.num_classes, self.feat_dim, name="xvector"
            )(x, lengths, deterministic=det)
            return logits
        if self.backend == "linear":
            return LinearModel(self.num_classes, name="linear")(
                x, lengths, deterministic=det
            )
        if self.backend in ("resnet", "resnet2", "resnet34", "resnet101"):
            factory = {
                "resnet": ResNet18,     # torchvision resnet18 stand-in
                "resnet2": ResNet18,
                "resnet34": ResNet34,
                "resnet101": ResNet101,
            }[self.backend]
            net = factory(
                feat_dim=self.feat_dim, embed_dim=256, pooling_func="MQMHASTP"
            )
            _, emb = net(x, lengths, train=train)
            return nn.Dense(self.num_classes, name="last_linear")(emb)
        if self.backend == "xvector2":
            net = XVEC(feat_dim=self.feat_dim, embed_dim=256,
                       pooling_func="TSTP", name="xvec")
            _, emb = net(x, lengths, train=train)
            return nn.Dense(self.num_classes, name="last_linear")(emb)
        raise ValueError(f"unknown backend: {self.backend}")

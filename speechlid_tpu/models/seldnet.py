"""SELDNet: joint sound-event detection (SED) + direction-of-arrival (DOA)
estimation over multi-channel spectrograms.

Reference: ``se/models/SELDNet.py`` (Seldnet_vanilla:13-85,
Seldnet_augmented:86-166) — one configurable flax module covers both: the
vanilla preset is ``cnn_filters=(64, 64, 64)`` with a single Dense per
head, the augmented one ``cnn_filters=(64, 128, 256, 512)`` with a 3-deep
MLP per head.

TPU-first notes: NHWC conv layout (XLA's native TPU layout — the
reference's NCHW is a permute away), one GRU scan per direction via
``nn.RNN`` (flax unrolls to ``lax.scan`` — static-length, compiles once),
and BatchNorm folded to inference statistics under ``deterministic``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _head(x, fc_size: int, out: int, n_hidden: int, dropout: float,
          deterministic: bool, name: str):
    for i in range(n_hidden):
        x = nn.relu(nn.Dense(fc_size, name=f"{name}_fc{i}")(x))
    x = nn.Dropout(dropout, deterministic=deterministic)(x)
    return nn.Dense(out, name=f"{name}_out")(x)


class SELDNet(nn.Module):
    """(B, C, freq, time) spectrogram → (sed (B, T', sed_out),
    doa (B, T', 3·sed_out)).

    ``cnn_filters``/``pool_size`` rows pool (freq, time); ``pool_time``
    False keeps full time resolution (vanilla default)."""

    freq_dim: int = 256
    output_classes: int = 14
    class_overlaps: int = 3
    cnn_filters: Sequence[int] = (64, 64, 64)
    pool_size: Sequence[Tuple[int, int]] = ((8, 2), (8, 2), (2, 2))
    pool_time: bool = True
    rnn_size: int = 128
    n_rnn: int = 2
    fc_size: int = 128
    head_layers: int = 1  # augmented preset: 3
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self, spec: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        sed_out = self.output_classes * self.class_overlaps
        x = jnp.transpose(spec, (0, 2, 3, 1))  # B, F, T, C (NHWC)
        for i, (filters, pool) in enumerate(
            zip(self.cnn_filters, self.pool_size)
        ):
            x = nn.Conv(filters, (3, 3), padding="SAME", name=f"conv_{i}")(x)
            x = nn.BatchNorm(
                momentum=0.9,
                use_running_average=deterministic, name=f"bn_{i}"
            )(x)
            x = nn.relu(x)
            pf, pt = pool[0], (pool[1] if self.pool_time else 1)
            x = nn.max_pool(x, (pf, pt), strides=(pf, pt))
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        b, f, t, c = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, t, c * f)
        for i in range(self.n_rnn):
            y = nn.Bidirectional(
                nn.RNN(nn.GRUCell(self.rnn_size)),
                nn.RNN(nn.GRUCell(self.rnn_size)),
                name=f"gru_{i}",
            )(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        sed = jax.nn.sigmoid(
            _head(x, self.fc_size, sed_out, self.head_layers,
                  self.dropout, deterministic, "sed")
        )
        doa = jnp.tanh(
            _head(x, self.fc_size, sed_out * 3, self.head_layers,
                  self.dropout, deterministic, "doa")
        )
        return sed, doa


def seldnet_vanilla(freq_dim: int = 256, input_channels: int = 8,
                    output_classes: int = 14, class_overlaps: int = 3,
                    pool_time: bool = True) -> SELDNet:
    """Reference Seldnet_vanilla preset (SELDNet.py:13-85)."""
    del input_channels  # flax infers input channels at init
    return SELDNet(
        freq_dim=freq_dim, output_classes=output_classes,
        class_overlaps=class_overlaps, pool_time=pool_time,
        cnn_filters=(64, 64, 64), pool_size=((8, 2), (8, 2), (2, 2)),
        rnn_size=128, n_rnn=2, fc_size=128, head_layers=1,
    )


def seldnet_augmented(freq_dim: int = 256, input_channels: int = 4,
                      output_classes: int = 14, class_overlaps: int = 3,
                      pool_time: bool = True) -> SELDNet:
    """Reference Seldnet_augmented preset (SELDNet.py:86-166)."""
    del input_channels
    return SELDNet(
        freq_dim=freq_dim, output_classes=output_classes,
        class_overlaps=class_overlaps, pool_time=pool_time,
        cnn_filters=(64, 128, 256, 512),
        pool_size=((8, 2), (8, 2), (2, 2), (1, 1)),
        rnn_size=256, n_rnn=3, fc_size=1024, head_layers=3, dropout=0.3,
    )

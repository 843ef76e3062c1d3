"""Secondary-task model zoo.

Rebuilds of the small models behind the reference's non-LID tasks:
- BaseCNN        (ccml/models/BaseCNN.py — mnist framework smoke)
- LSTMLM         (lm/model/lstm_model.py — word-level LSTM LM)
- ResNet1D       (rml/Resnet1d.py — pad-same conv blocks, optional GRU head,
                  optional SNR auxiliary regression)
- forecasting zoo (spec_pred/CausalConvNet.py — MLP / LSTM / CnnLSTM / TCN /
                  small Transformer over sliding windows)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class BaseCNN(nn.Module):
    """Two conv blocks + MLP classifier (mnist smoke model)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, H, W, C)
        for feats in (32, 64):
            x = nn.Conv(feats, (3, 3), padding=1)(x)
            x = jax.nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x = jax.nn.relu(nn.Dense(128)(x))
        x = nn.Dropout(0.1, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)


class LSTMLM(nn.Module):
    """Embedding → (bi)LSTM → Linear over vocab (lm/model/lstm_model.py)."""

    vocab_size: int
    embedding_dim: int = 128
    hidden_size: int = 256
    num_layers: int = 1
    dropout: float = 0.0
    bidirectional: bool = False

    @nn.compact
    def __call__(self, ids, lengths=None, deterministic: bool = True):
        x = nn.Embed(self.vocab_size, self.embedding_dim)(ids)
        for i in range(self.num_layers):
            if self.bidirectional:
                x = nn.Bidirectional(
                    nn.RNN(nn.OptimizedLSTMCell(self.hidden_size)),
                    nn.RNN(nn.OptimizedLSTMCell(self.hidden_size)),
                    name=f"bilstm_{i}",
                )(x, seq_lengths=lengths)
            else:
                x = nn.RNN(
                    nn.OptimizedLSTMCell(self.hidden_size), name=f"lstm_{i}"
                )(x, seq_lengths=lengths)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.vocab_size)(x)


class ResNet1DBlock(nn.Module):
    """Pad-same 1-D conv residual block with BN and max-pool downsampling
    (rml/Resnet1d.py:99-198 semantics)."""

    out_channels: int
    kernel_size: int = 16
    stride: int = 1
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, T, C)
        norm = lambda n: nn.BatchNorm(momentum=0.9, use_running_average=not train, name=n)
        y = norm("bn1")(x)
        y = jax.nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Conv(self.out_channels, (self.kernel_size,),
                    strides=(self.stride,), padding="SAME", name="conv1")(y)
        y = norm("bn2")(y)
        y = jax.nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME",
                    name="conv2")(y)
        if self.stride > 1:
            x = nn.max_pool(x, (self.stride,), strides=(self.stride,),
                            padding="SAME")
        if x.shape[-1] != self.out_channels:
            pad = self.out_channels - x.shape[-1]
            x = jnp.pad(x, [(0, 0), (0, 0), (0, pad)])
        return x + y


class ResNet1D(nn.Module):
    """1-D resnet classifier for IQ radio signals, with optional GRU head
    and an SNR auxiliary regressor (rml/Resnet1d.py:199-…, RMLModule's
    use_snr_info)."""

    n_classes: int = 11
    base_filters: int = 32
    kernel_size: int = 16
    n_blocks: int = 6
    downsample_every: int = 2
    dropout: float = 0.2
    use_rnn: bool = False
    use_snr_head: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, 2) IQ
        y = nn.Conv(self.base_filters, (self.kernel_size,), padding="SAME",
                    name="stem")(x)
        ch = self.base_filters
        for i in range(self.n_blocks):
            stride = 2 if (i % self.downsample_every == 1) else 1
            if i > 0 and i % (2 * self.downsample_every) == 0:
                ch *= 2
            y = ResNet1DBlock(ch, self.kernel_size, stride, self.dropout,
                              name=f"block_{i}")(y, train)
        y = nn.BatchNorm(momentum=0.9, use_running_average=not train, name="bn_final")(y)
        y = jax.nn.relu(y)
        if self.use_rnn:
            y = nn.RNN(nn.GRUCell(ch), name="gru")(y)
            feat = y[:, -1, :]
        else:
            feat = jnp.mean(y, axis=1)
        logits = nn.Dense(self.n_classes, name="cls")(feat)
        if self.use_snr_head:
            snr = nn.Dense(1, name="snr")(feat)[:, 0]
            return logits, snr
        return logits


# ---------------------------------------------------------------------------
# spec_pred forecasting zoo: window (B, W, D) → next frame (B, D)
# ---------------------------------------------------------------------------


class ForecastMLP(nn.Module):
    out_dim: int
    hidden: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x.reshape(x.shape[0], -1)
        y = jax.nn.relu(nn.Dense(self.hidden)(y))
        y = jax.nn.relu(nn.Dense(self.hidden)(y))
        return nn.Dense(self.out_dim)(y)


class ForecastLSTM(nn.Module):
    out_dim: int
    hidden: int = 256
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_layers):
            x = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name=f"lstm_{i}")(x)
        return nn.Dense(self.out_dim)(x[:, -1, :])


class ForecastCnnLSTM(nn.Module):
    out_dim: int
    hidden: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(64, (3,), padding="SAME")(x)
        y = jax.nn.relu(y)
        y = nn.Conv(64, (3,), padding="SAME")(y)
        y = jax.nn.relu(y)
        y = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="lstm")(y)
        return nn.Dense(self.out_dim)(y[:, -1, :])


class CausalConvBlock(nn.Module):
    """TCN temporal block: left-padded dilated convs + residual
    (spec_pred/CausalConvNet.py TemporalBlock/Chomp1d)."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) * self.dilation
        y = nn.Conv(self.channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,),
                    padding=[(pad, 0)], name="conv1")(x)
        y = jax.nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Conv(self.channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,),
                    padding=[(pad, 0)], name="conv2")(y)
        y = jax.nn.relu(y)
        if x.shape[-1] != self.channels:
            x = nn.Dense(self.channels, name="proj")(x)
        return jax.nn.relu(x + y)


class ForecastTCN(nn.Module):
    out_dim: int
    channels: Sequence[int] = (64, 64, 64)
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate(self.channels):
            x = CausalConvBlock(ch, self.kernel_size, dilation=2**i,
                                name=f"tcn_{i}")(x, train)
        return nn.Dense(self.out_dim)(x[:, -1, :])


class ForecastTransformer(nn.Module):
    out_dim: int
    d_model: int = 128
    heads: int = 4
    layers: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Dense(self.d_model)(x)
        t = y.shape[1]
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (1, t, self.d_model))
        y = y + pos
        for i in range(self.layers):
            attn_in = nn.LayerNorm(name=f"ln1_{i}")(y)
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, name=f"attn_{i}"
            )(attn_in, attn_in)
            y = y + attn
            ff_in = nn.LayerNorm(name=f"ln2_{i}")(y)
            ff = nn.Dense(4 * self.d_model)(ff_in)
            ff = jax.nn.gelu(ff)
            y = y + nn.Dense(self.d_model)(ff)
        return nn.Dense(self.out_dim)(y[:, -1, :])


FORECAST_MODELS = {
    "mlp": ForecastMLP,
    "lstm": ForecastLSTM,
    "cnn_lstm": ForecastCnnLSTM,
    "causal_conv": ForecastTCN,
    "transformer": ForecastTransformer,
}

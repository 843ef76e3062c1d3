"""Per-language CTC "expert" heads + language discriminator, TPU-first.

Rebuild of the reference's joint LID+ASR model layer
(lid/WavLMMutiLangModel.py, lid/Wav2vecMutiLangModel.py):

- Reference: a python ``ModuleDict`` of per-language heads with *different*
  vocab sizes, looped over at inference (``forward(lang=None)`` runs every
  head, WavLMMutiLangModel.py:276-284).
- Here: heads are **stacked weight tensors evaluated under ``nn.vmap``** —
  all L languages run in ONE compiled graph (SURVEY.md §2.5 EP row).  Vocab
  sizes are padded to max+1 with logit masks; the blank is unified at the
  LAST padded index (CTC is blank-position agnostic; the reference's
  per-language blank=V_l convention maps to ours by construction since we
  train from scratch).
- ``LangDiscriminator`` scoring (WavLMMutiLangModel.py:386-433): per
  language, mean over *non-blank* argmax frames of the max log-softmax,
  normalized by ln(V_l) — plus the vocab-size-corrected quadratic variant —
  and a detached 2-layer MLP score head.

Head flavours (matching the reference):
- ``ConformerLinearHead``  (ConformerLinear, WavLMMutiLangModel.py:287-351)
- ``BiLSTMLinearHead``     (LSTMLinear / ConformerLSTMLinear,
                            Wav2vecMutiLangModel.py:262-291)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speechlid_tpu.models.conformer import ConformerBlock

Dtype = Any
_NEG = jnp.finfo(jnp.float32).min


class ConformerLinearHead(nn.Module):
    """N ConformerBlocks → dropout → Dense(V+1)."""

    vocab_size: int  # padded vocab WITHOUT blank; output dim = vocab_size + 1
    linear_dim: int = 768
    num_layers: int = 1
    dropout: float = 0.0
    dim_head: int = 32
    num_head: int = 8
    use_double_swish: bool = False
    dtype: Dtype = jnp.float32
    quant_dot: Optional[str] = None  # int8 serving path (ops/quant.py)

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        from speechlid_tpu.ops.quant import quant_dot_general

        for i in range(self.num_layers):
            x = ConformerBlock(
                dim=self.linear_dim,
                dim_head=self.dim_head,
                heads=self.num_head,
                use_double_swish=self.use_double_swish,
                dtype=self.dtype,
                quant_dot=self.quant_dot,
                name=f"block_{i}",
            )(x, mask, deterministic)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.vocab_size + 1, dtype=self.dtype,
                        dot_general=quant_dot_general(self.quant_dot))(x)


class BiLSTMLinearHead(nn.Module):
    """Bidirectional LSTM (hidden = dim//2 per direction) → Dense(V+1),
    matching torch.nn.LSTM(bidirectional=True) + Linear on packed sequences."""

    vocab_size: int
    linear_dim: int = 768
    num_layers: int = 1
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths=None, deterministic: bool = True):
        hidden = self.linear_dim // 2
        for i in range(self.num_layers):
            bi = nn.Bidirectional(
                nn.RNN(nn.OptimizedLSTMCell(hidden)),
                nn.RNN(nn.OptimizedLSTMCell(hidden)),
                name=f"bilstm_{i}",
            )
            x = bi(x, seq_lengths=lengths)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.vocab_size + 1, dtype=self.dtype)(x)


class MultiLangHeadStack(nn.Module):
    """All language heads as one vmapped module.

    Input (B, T, D) → logits (L, B, T, V_max+1); invalid vocab slots (ids in
    [V_l, V_max)) are masked to -inf so soft/log-softmax and argmax behave as
    per-language (V_l+1)-way heads.  Blank is index V_max for every language.
    """

    vocab_sizes: Sequence[int]  # true per-language vocab sizes (no blank)
    head_type: str = "conformer_linear"  # or "bilstm"
    linear_dim: int = 768
    num_layers: int = 1
    dropout: float = 0.0
    dim_head: int = 32
    num_head: int = 8
    use_double_swish: bool = False
    dtype: Dtype = jnp.float32
    quant_dot: Optional[str] = None  # int8 serving path (ops/quant.py)

    @property
    def vocab_max(self) -> int:
        return int(max(self.vocab_sizes))

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, T, D)
        lengths: Optional[jax.Array] = None,  # (B,) frames
        deterministic: bool = True,
    ) -> jax.Array:
        n_lang = len(self.vocab_sizes)
        vmax = self.vocab_max
        mask = None
        if lengths is not None:
            mask = jnp.arange(x.shape[1])[None, :] < lengths[:, None]

        # NOTE: nn.vmap drops kwargs — every argument must be positional.
        if self.head_type == "bilstm":
            head_cls = nn.vmap(
                BiLSTMLinearHead,
                in_axes=(None, None, None),
                out_axes=0,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                axis_size=n_lang,
            )
            head = head_cls(
                vocab_size=vmax, linear_dim=self.linear_dim,
                num_layers=self.num_layers, dropout=self.dropout,
                dtype=self.dtype, name="heads",
            )
            logits = head(x, lengths, deterministic)
        else:
            head_cls = nn.vmap(
                ConformerLinearHead,
                in_axes=(None, None, None),
                out_axes=0,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True},
                axis_size=n_lang,
            )
            head = head_cls(
                vocab_size=vmax, linear_dim=self.linear_dim,
                num_layers=self.num_layers, dropout=self.dropout,
                dim_head=self.dim_head, num_head=self.num_head,
                use_double_swish=self.use_double_swish,
                dtype=self.dtype, quant_dot=self.quant_dot, name="heads",
            )
            logits = head(x, mask, deterministic)

        # (L, B, T, vmax+1): mask padded vocab ids per language
        sizes = jnp.asarray(list(self.vocab_sizes))[:, None, None, None]
        vocab_ids = jnp.arange(vmax + 1)[None, None, None, :]
        valid = (vocab_ids < sizes) | (vocab_ids == vmax)  # chars ∪ blank
        return jnp.where(valid, logits, _NEG)


def lang_confidence_scores(
    logits: jax.Array,  # (L, B, T, V+1) — blank last
    vocab_sizes: jax.Array,  # (L,) true sizes
    lengths: Optional[jax.Array] = None,  # (B,) valid frames
    corrected: bool = False,
) -> jax.Array:
    """Confidence score per (utterance, language), (B, L).

    Reference formula (WavLMMutiLangModel.py:410-427): over frames whose
    argmax is NOT blank, mean of max log-softmax; normalized by ln(V_l)
    (``corrected=False``), or exp-mean with the quadratic vocab-size
    correction fit through (1/Nb, 1/Nb²·a+…) and (1, 1)
    (``corrected=True``, WavLMMutiLangModel.py:420-427).

    Deviation for the zero-evidence case: when a head decodes ALL frames as
    blank (cnt == 0) the reference divides 0/0 — and a naive eps-guard
    yields score 0.0, which OUTRANKS every real score (real means are
    negative log-probs), so an all-blank wrong-language head would win the
    argmax.  No evidence must mean worst confidence: we floor cnt == 0 at
    -2.0 (strictly below the ≈ -ln(V+1)/ln(V) ≥ -1.1 reachable minimum) for
    the uncorrected score and at conf = 0 (the quadratic's fixed point,
    strictly below any exp(mean log-prob) > 0) for the corrected one.
    """
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    max_value = jnp.max(lp, axis=-1)  # (L, B, T)
    argmax = jnp.argmax(lp, axis=-1)
    blank = logits.shape[-1] - 1
    nonblank = argmax != blank
    if lengths is not None:
        frame_ok = jnp.arange(logits.shape[2])[None, :] < lengths[:, None]  # (B,T)
        nonblank = nonblank & frame_ok[None, :, :]
    cnt = jnp.sum(nonblank, axis=-1).astype(jnp.float32)  # (L, B)
    total = jnp.sum(jnp.where(nonblank, max_value, 0.0), axis=-1)  # (L, B)
    v = vocab_sizes.astype(jnp.float32)[:, None]
    has_evidence = cnt > 0
    if not corrected:
        score = jnp.where(
            has_evidence, total / (cnt * jnp.log(v) + 1e-5), -2.0
        )
    else:
        nb = jnp.max(vocab_sizes) + 1
        conf = jnp.where(has_evidence, jnp.exp(total / (cnt + 1e-5)), 0.0)
        a = (nb - v - 1.0) / nb
        b = (1.0 + v) / nb
        score = a * conf**2 + b * conf
    return jnp.transpose(score)  # (B, L)


class LangDiscriminatorMLP(nn.Module):
    """2-layer MLP refining the (detached) confidence vector
    (WavLMMutiLangModel.py:397-402)."""

    n_lang: int
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, scores: jax.Array) -> jax.Array:  # (B, L)
        x = jax.lax.stop_gradient(scores)
        x = nn.Dense(self.hidden_dim)(x)
        x = jax.nn.relu(x)
        return nn.Dense(self.n_lang)(x)


class MutiLangModel(nn.Module):
    """Featurizer + stacked per-language CTC heads + discriminator.

    The TPU equivalent of WavLMMutiLangModel / Wav2vecMutiLangModel /
    ConformerMutiLangModel: ``featurizer`` is any module mapping
    (wav/feats, lengths) → (B, T', D) with a ``subsampled_lengths`` —
    passed in pre-built so this class stays featurizer-agnostic.

    __call__ returns (logits (L, B, T', V+1), feat_lengths (B,)).

    Initialize with ``method=MutiLangModel.infer`` so the discriminator MLP
    params are created too (plain ``__call__`` never touches them).
    """

    featurizer: nn.Module
    vocab_sizes: Sequence[int]
    head_type: str = "conformer_linear"
    linear_dim: int = 768
    num_layers: int = 1
    dropout: float = 0.0
    dim_head: int = 32
    num_head: int = 8
    use_double_swish: bool = False
    disc_hidden: int = 128  # discriminator MLP width (reference hidden_dim,
    # lid/ConformerLangModel.py:377 — LidSuperviseModule passes 32)
    dtype: Dtype = jnp.float32
    quant_dot: Optional[str] = None  # int8 serving path for the heads
    # (pair with featurizer quant via WavLMConfig.quant_dot / ConformerModel)

    def setup(self):
        self.heads = MultiLangHeadStack(
            vocab_sizes=self.vocab_sizes,
            head_type=self.head_type,
            linear_dim=self.linear_dim,
            num_layers=self.num_layers,
            dropout=self.dropout,
            dim_head=self.dim_head,
            num_head=self.num_head,
            use_double_swish=self.use_double_swish,
            dtype=self.dtype,
            quant_dot=self.quant_dot,
        )
        self.discriminator = LangDiscriminatorMLP(
            n_lang=len(self.vocab_sizes), hidden_dim=self.disc_hidden
        )

    def __call__(
        self,
        x: jax.Array,
        lengths: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        feats = self.featurizer(x, lengths, deterministic=deterministic)
        feat_lengths = (
            None if lengths is None
            else self.featurizer.subsampled_lengths(lengths)
        )
        logits = self.heads(feats, feat_lengths, deterministic=deterministic)
        return logits, feat_lengths

    def discriminate(self, scores: jax.Array) -> jax.Array:
        return self.discriminator(scores)

    def infer(
        self, x: jax.Array, lengths: Optional[jax.Array] = None
    ) -> Dict[str, jax.Array]:
        """All-language inference (reference forward(lang=None) +
        LangDiscriminator): returns dict with logits, confidence scores,
        mlp scores, predicted lang."""
        logits, feat_lengths = self(x, lengths, deterministic=True)
        scores = lang_confidence_scores(
            logits, jnp.asarray(list(self.vocab_sizes)), feat_lengths
        )
        mlp_scores = self.discriminator(scores)
        return {
            "logits": logits,
            "feat_lengths": feat_lengths,
            "scores": scores,
            "mlp_scores": mlp_scores,
            "pred_lang": jnp.argmax(scores, axis=-1),
        }


# ---------------------------------------------------------------------------
# torch → flax conversion for the reference supervised joint model
# ---------------------------------------------------------------------------


def convert_supervised_lid_state(
    torch_state: Dict[str, "np.ndarray"],
    langs: Sequence[str],
    lang2vocab: Dict[str, int],
    n_blocks: int,
    sub_sampling: int = 2,
    head_layers: int = 1,
) -> Dict:
    """Reference ``ConformerMutiLangModel`` state_dict (numpy-converted,
    lid/ConformerLangModel.py:16) → flax variables for our
    :class:`MutiLangModel` with a ConformerModel featurizer.

    ``langs`` fixes the stacking order (axis 0 of every head leaf) and must
    match the ``vocab_sizes`` order of the target model.  The reference's
    per-language ``Linear(dim, V_l+1)`` heads (blank at index V_l) map into
    the max-V-padded stacked Dense: char rows 0..V_l-1 keep their index,
    the blank row lands at the shared LAST index V_max, padded slots are
    zeros (masked to -inf at apply time, MultiLangHeadStack.__call__).
    """
    from speechlid_tpu.models.conformer import convert_conformer_state

    sd = {k: np.array(v) for k, v in torch_state.items()}  # copy, not view
    feat = convert_conformer_state(
        sd, n_blocks=n_blocks, sub_sampling=sub_sampling,
        prefix="model.featurizer.",
    )
    heads_p, heads_s = _convert_stacked_heads(
        sd, langs, lang2vocab, head_layers
    )
    return {
        "params": {
            "featurizer": feat["params"],
            "heads": {"heads": heads_p},
            "discriminator": _convert_discriminator(sd),
        },
        "batch_stats": {
            "featurizer": feat["batch_stats"],
            "heads": {"heads": heads_s},
        },
    }


def _convert_stacked_heads(
    sd: Dict[str, "np.ndarray"],
    langs: Sequence[str],
    lang2vocab: Dict[str, int],
    head_layers: int = 1,
):
    """Reference per-language ``ConformerLinear`` heads
    (lid/WavLMMutiLangModel.py:287-351 — identical class in
    ConformerLangModel) → stacked (L, …) flax leaves for
    :class:`MultiLangHeadStack`.  The per-language ``Linear(dim, V_l+1)``
    (blank at index V_l) maps into the max-V-padded stacked Dense: char
    rows keep their index, the blank row lands at the shared LAST index
    V_max, padded slots are zeros (masked to -inf at apply time)."""
    from speechlid_tpu.models.conformer import convert_conformer_block_state

    vmax = max(lang2vocab[lg] for lg in langs)
    head_params: list = []
    head_stats: list = []
    for lg in langs:
        hp: dict = {}
        hs: dict = {}
        for i in range(head_layers):
            bp, bs = convert_conformer_block_state(
                sd, f"model.last_projects.{lg}.block."
            )
            hp[f"block_{i}"] = bp
            hs[f"block_{i}"] = bs
        w = sd[f"model.last_projects.{lg}.linear.weight"]  # (V_l+1, D)
        b = sd[f"model.last_projects.{lg}.linear.bias"]
        v_l, dim = w.shape[0] - 1, w.shape[1]
        kernel = np.zeros((dim, vmax + 1), np.float32)
        bias = np.zeros((vmax + 1,), np.float32)
        kernel[:, :v_l] = w[:v_l].T
        kernel[:, vmax] = w[v_l]
        bias[:v_l] = b[:v_l]
        bias[vmax] = b[v_l]
        hp["Dense_0"] = {"kernel": kernel, "bias": bias}
        head_params.append(hp)
        head_stats.append(hs)

    stack = lambda *leaves: np.stack([np.asarray(l) for l in leaves])  # noqa: E731
    heads_p = jax.tree_util.tree_map(stack, *head_params)
    heads_s = jax.tree_util.tree_map(stack, *head_stats)
    return heads_p, heads_s


def _convert_discriminator(sd: Dict[str, "np.ndarray"]) -> Dict:
    return {
        "Dense_0": {
            "kernel": sd["lang_discriminator.linear.0.weight"].T,
            "bias": sd["lang_discriminator.linear.0.bias"],
        },
        "Dense_1": {
            "kernel": sd["lang_discriminator.linear.2.weight"].T,
            "bias": sd["lang_discriminator.linear.2.bias"],
        },
    }


def convert_joint_wavlm_lid_state(
    torch_state: Dict[str, "np.ndarray"],
    langs: Sequence[str],
    lang2vocab: Dict[str, int],
    wavlm_cfg,
    head_layers: int = 1,
) -> Dict:
    """Reference ``WavLMMutiLangModel`` state_dict (numpy-converted,
    lid/WavLMMutiLangModel.py:19) → flax variables for our
    :class:`MutiLangModel` with an ``SSLFeaturizerModel`` WavLM featurizer
    (feature_selection='last_hidden_state', matching the reference's
    ``only_last=True`` path, lid/wavlm/example.py:43-46).

    The WavLM upstream lands under ``params['featurizer']['upstream']``
    (SSLFeaturizerModel's module name) via
    :func:`speechlid_tpu.models.wavlm.convert_wavlm_state`; the WavLM
    trunk has no BatchNorm, so featurizer batch_stats are empty."""
    from speechlid_tpu.models.wavlm import convert_wavlm_state

    sd = {k: np.array(v) for k, v in torch_state.items()}
    prefix = "model.featurizer.model."
    upstream_sd = {
        k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
    }
    upstream = convert_wavlm_state(upstream_sd, wavlm_cfg)
    heads_p, heads_s = _convert_stacked_heads(
        sd, langs, lang2vocab, head_layers
    )
    return {
        "params": {
            "featurizer": {"upstream": upstream},
            "heads": {"heads": heads_p},
            "discriminator": _convert_discriminator(sd),
        },
        "batch_stats": {
            "heads": {"heads": heads_s},
        },
    }

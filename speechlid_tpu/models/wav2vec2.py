"""wav2vec 2.0 upstream + s3prl-style Featurizer.

The reference vendors s3prl's wav2vec2/XLSR upstream on top of fairseq
(lid/s3prl_updream/: UpstreamBase hook capture of every encoder layer,
Featurizer softmax-weighted layer sum, fairseq Wav2Vec2Model).  The
inference-path architecture of fairseq's Wav2Vec2Model is a strict subset of
WavLM (same conv extractor / conv positional embedding / transformer; no
gated relative position bias), so the JAX encoder is :class:`WavLM` with
``relative_position_embedding=False`` — one implementation, two checkpoints.
The quantizer/contrastive heads exist only for pre-training and are dropped
(the reference never runs them either: wav2vec2_expert.py extracts features
only).

``convert_fairseq_wav2vec2_state`` maps a fairseq checkpoint's state dict
(no fairseq import needed — torch pickle only) onto the shared layout,
replacing the reference's fairseq dependency (SURVEY.md §2.4 row 4).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speechlid_tpu.models.wavlm import (
    WavLM,
    WavLMConfig,
    conv_out_lengths,
    convert_wavlm_state,
)


def wav2vec2_config(
    encoder_layers: int = 12,
    encoder_embed_dim: int = 768,
    encoder_ffn_embed_dim: int = 3072,
    encoder_attention_heads: int = 12,
    extractor_mode: str = "default",  # 'layer_norm' for large/XLSR
    layer_norm_first: bool = False,
    conv_feature_layers: str = "[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2",
    conv_bias: bool = False,
    normalize: bool = False,
    **overrides: Any,
) -> WavLMConfig:
    return WavLMConfig(
        extractor_mode=extractor_mode,
        encoder_layers=encoder_layers,
        encoder_embed_dim=encoder_embed_dim,
        encoder_ffn_embed_dim=encoder_ffn_embed_dim,
        encoder_attention_heads=encoder_attention_heads,
        layer_norm_first=layer_norm_first,
        conv_feature_layers=conv_feature_layers,
        conv_bias=conv_bias,
        normalize=normalize,
        relative_position_embedding=False,
        gru_rel_pos=False,
        **overrides,
    )


class Wav2Vec2(nn.Module):
    """wav2vec2 encoder == WavLM without relative position bias."""

    config: WavLMConfig

    def feat_lengths(self, lengths: jax.Array) -> jax.Array:
        return conv_out_lengths(lengths, self.config.conv_layers)

    # wave normalization handled by cfg.normalize (layer-norm'd models);
    # reference applies it in wav2vec2_expert.py:55-60
    @nn.compact
    def __call__(self, x, lengths=None, mask=False, ret_layer_results=False,
                 deterministic=True):
        return WavLM(self.config, name="encoder")(
            x, lengths, mask=mask, ret_layer_results=ret_layer_results,
            deterministic=deterministic,
        )


class Featurizer(nn.Module):
    """s3prl Featurizer (lid/s3prl_updream/interfaces.py:133-238):
    softmax-weighted sum of hidden layers with learnable weights, or plain
    last-layer selection."""

    num_layers: int  # number of hidden states fed in (L+1 incl. input)
    feature_selection: str = "hidden_states"  # or "last_hidden_state"

    @nn.compact
    def __call__(self, layer_feats: jax.Array) -> jax.Array:
        # layer_feats: (L, B, T, C)
        if self.feature_selection == "last_hidden_state":
            return layer_feats[-1]
        weights = self.param(
            "layer_weights", nn.initializers.zeros, (self.num_layers,)
        )
        norm = jax.nn.softmax(weights)
        # weighted sum via one tensordot — MXU-friendly (s3prl does a
        # stacked-mul-sum, interfaces.py:212)
        return jnp.tensordot(norm, layer_feats, axes=(0, 0))


class SSLFeaturizerModel(nn.Module):
    """Upstream (WavLM or wav2vec2) + Featurizer: (B, T) wav → (B, T', C).

    The TPU equivalent of the reference's featurizer wrappers
    (Wav2vecMutiModel.featurizer = UpstreamExpert + Featurizer,
    lid/Wav2vecMutiLangModel.py:171-227; WavLMMutiModel.featurizer =
    WavLMModel, lid/WavLMMutiLangModel.py:217-227).
    """

    config: WavLMConfig
    feature_selection: str = "last_hidden_state"
    mask_attention: bool = False
    remat: bool = False
    scan_layers: bool = False  # nn.scan encoder layers (see models/wavlm.py)

    def subsampled_lengths(self, lengths: jax.Array) -> jax.Array:
        return conv_out_lengths(lengths, self.config.conv_layers)

    @nn.compact
    def __call__(self, x, lengths=None, deterministic=True):
        upstream = WavLM(
            self.config, mask_attention=self.mask_attention,
            remat=self.remat, scan_layers=self.scan_layers, name="upstream",
        )
        if self.feature_selection == "last_hidden_state":
            feats, _ = upstream(
                x, lengths, mask=not deterministic,
                deterministic=deterministic,
            )
            return feats
        _, _, layers = upstream(
            x, lengths, mask=not deterministic, ret_layer_results=True,
            deterministic=deterministic,
        )
        stacked = jnp.stack(layers, axis=0)
        return Featurizer(
            num_layers=stacked.shape[0],
            feature_selection=self.feature_selection,
            name="featurizer",
        )(stacked)


# ---------------------------------------------------------------------------
# fairseq checkpoint conversion
# ---------------------------------------------------------------------------

_DROP_PREFIXES = (
    "quantizer.", "project_q.", "final_proj.", "target_glu.",
)


def convert_fairseq_wav2vec2_state(
    torch_state: Dict[str, np.ndarray], cfg: WavLMConfig
) -> Dict:
    """fairseq Wav2Vec2Model state dict → flax params for :class:`WavLM`.

    fairseq and WavLM share parameter names for the inference path
    (feature_extractor / post_extract_proj / encoder.pos_conv /
    encoder.layers.N.* / layer_norm / mask_emb); pre-training-only heads are
    dropped.
    """
    state = {
        k: v for k, v in torch_state.items()
        if not any(k.startswith(p) for p in _DROP_PREFIXES)
    }
    return convert_wavlm_state(state, cfg)


def load_fairseq_wav2vec2_checkpoint(
    pt_path: str,
) -> Tuple[Dict, WavLMConfig]:
    """Load a fairseq wav2vec2 .pt → (flax params, config) without fairseq
    (replaces lid/s3prl_updream/wav2vec2_expert.py:24-35)."""
    import torch

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    args = ckpt.get("cfg") or ckpt.get("args")
    if isinstance(args, dict) and "model" in args:
        args = args["model"]
    elif hasattr(args, "model"):
        args = args.model
    if not isinstance(args, dict):
        args = vars(args)
    cfg = wav2vec2_config(
        encoder_layers=args.get("encoder_layers", 12),
        encoder_embed_dim=args.get("encoder_embed_dim", 768),
        encoder_ffn_embed_dim=args.get("encoder_ffn_embed_dim", 3072),
        encoder_attention_heads=args.get("encoder_attention_heads", 12),
        extractor_mode=args.get("extractor_mode", "default"),
        layer_norm_first=args.get("layer_norm_first", False),
        conv_feature_layers=args.get(
            "conv_feature_layers",
            "[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2",
        ),
        conv_bias=args.get("conv_bias", False),
        normalize=args.get("normalize", False),
    )
    state = {k: v.numpy() for k, v in ckpt["model"].items()}
    return convert_fairseq_wav2vec2_state(state, cfg), cfg

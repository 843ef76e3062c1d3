"""Parameter sharding rules: dp / tp / ep layouts over a (data, model) mesh.

The reference has only DDP (SURVEY.md §2.5); these rules are the TPU-native
scale-out design beyond it:

- **dp**: batch sharded on 'data'; XLA inserts the gradient all-reduce.
- **tp** (Megatron-style) for transformer blocks: the FFN's expand kernel
  splits on its OUTPUT dim and the contract kernel on its INPUT dim, so the
  pair needs a single all-reduce; attention q/k/v split on heads (output
  dim), the out-projection on its input dim.
- **ep**: the vmap-stacked per-language CTC heads shard on their leading
  language axis.

Rules are path-regex → PartitionSpec; anything unmatched replicates.  With
``jax.jit`` + these NamedShardings, GSPMD propagates the layouts and places
the collectives on ICI — no hand-written psum.
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Rule = Tuple[str, P]

# Megatron-style rules for our Conformer blocks (models/conformer.py naming)
CONFORMER_TP_RULES: List[Rule] = [
    # feed-forward: expand on output dim, contract on input dim
    (r".*ff\d/Dense_0/kernel$", P(None, "model")),
    (r".*ff\d/Dense_0/bias$", P("model")),
    (r".*ff\d/Dense_1/kernel$", P("model", None)),
    # attention: q/kv projections split heads (output dim), out-proj input
    (r".*attn/to_q/kernel$", P(None, "model")),
    (r".*attn/to_kv/kernel$", P(None, "model")),
    (r".*attn/to_out/kernel$", P("model", None)),
    # conv module pointwise expand / contract
    (r".*conv/Dense_0/kernel$", P(None, "model")),
    (r".*conv/Dense_0/bias$", P("model")),
    (r".*conv/Dense_1/kernel$", P("model", None)),
]

# WavLM / wav2vec2 encoder layers (models/wavlm.py naming)
WAVLM_TP_RULES: List[Rule] = [
    (r".*self_attn/q_proj/kernel$", P(None, "model")),
    (r".*self_attn/k_proj/kernel$", P(None, "model")),
    (r".*self_attn/v_proj/kernel$", P(None, "model")),
    (r".*self_attn/out_proj/kernel$", P("model", None)),
    (r".*/fc1/kernel$", P(None, "model")),
    (r".*/fc1/bias$", P("model")),
    (r".*/fc2/kernel$", P("model", None)),
]

# expert-parallel: stacked per-language heads (models/multilang.py)
EP_RULES: List[Rule] = [
    (r"^heads/.*", P("model")),
    (r".*/heads/.*", P("model")),
]


def _leaf_path(path) -> str:
    return "/".join(getattr(p, "key", str(p)) for p in path)


def _divisible(shape: Tuple[int, ...], spec: P, mesh: Mesh) -> bool:
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        size = mesh.shape[axis]
        if dim % size != 0:
            return False
    return len(spec) <= len(shape)


def make_param_sharder(
    mesh: Mesh, rules: Sequence[Rule]
) -> Callable:
    """→ fn(params) placing every leaf per the first matching rule
    (replicated otherwise; rules whose axis doesn't divide the dim are
    skipped so odd vocab/head counts degrade gracefully)."""
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def shard(params):
        def place(path, leaf):
            name = _leaf_path(path)
            for pat, spec in compiled:
                if pat.match(name) and _divisible(leaf.shape, spec, mesh):
                    return jax.device_put(leaf, NamedSharding(mesh, spec))
            return jax.device_put(leaf, NamedSharding(mesh, P()))

        return jax.tree_util.tree_map_with_path(place, params)

    return shard


def describe_shardings(params, max_items: int = 0) -> List[str]:
    """Human-readable sharding report (debugging / tests)."""
    lines = []

    def visit(path, leaf):
        sh = getattr(leaf, "sharding", None)
        spec = getattr(sh, "spec", None)
        if spec is not None and any(s is not None for s in spec):
            lines.append(f"{_leaf_path(path)} {leaf.shape} -> {spec}")
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return lines[:max_items] if max_items else lines

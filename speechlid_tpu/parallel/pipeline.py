"""Pipeline parallelism (pp): GPipe-style microbatch pipelining over a
mesh axis, plus sequence-parallel (sp) activation sharding helpers.

The reference scales only by DDP (SURVEY.md §2.5 — ccml/trainer.py DDP
wrapping); pp/sp are TPU-native scale-out designs beyond it, built the XLA
way rather than with NCCL send/recv ranks:

- **pp** (:func:`pipeline_apply`): the repeated trunk (a stack of identical
  blocks, e.g. Conformer or WavLM encoder layers) is split into S stages
  laid out on a mesh axis.  A ``shard_map`` program runs the classic
  shift-register schedule: each tick every device applies its stage to the
  activation it holds, then ``lax.ppermute`` shifts activations one stage
  down the ring over ICI.  M microbatches drain in M+S-1 ticks (bubble
  fraction (S-1)/(M+S-1)).  The tick loop is a ``lax.scan`` so the whole
  pipeline — forward AND backward (ppermute/scan are differentiable, the
  reverse schedule materializes automatically from autodiff) — is ONE
  compiled XLA program.
- **sp** (:func:`shard_time`): activations sharded along the time axis via
  ``with_sharding_constraint`` so frame-local work (the mel frontend,
  frame-wise norms, FFNs) computes on T/seq-shard slices; GSPMD inserts the
  all-gather exactly where cross-frame ops (attention, depthwise conv)
  need full sequences.

Both compose with the dp/tp/ep parameter rules in
:mod:`speechlid_tpu.parallel.sharding` on one multi-axis mesh.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stage_params(param_list) -> Any:
    """Stack S per-stage param pytrees into one pytree with a leading
    stage axis (leaf shapes (S, ...)), ready to shard with
    ``P('stage', ...)``."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *param_list
    )


def split_microbatches(x: jax.Array, n_microbatch: int) -> jax.Array:
    """(B, ...) → (M, B/M, ...)."""
    b = x.shape[0]
    if b % n_microbatch != 0:
        raise ValueError(f"batch {b} not divisible by M={n_microbatch}")
    return x.reshape((n_microbatch, b // n_microbatch) + x.shape[1:])


def pipeline_apply(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stage_params: Any,
    x: jax.Array,
    mesh: Mesh,
    axis: str = "stage",
    n_microbatch: Optional[int] = None,
):
    """Run ``x`` through S pipeline stages laid out on ``mesh[axis]``.

    - ``stage_fn(params_one_stage, act) -> act`` — one stage's computation;
      activation shape must be uniform across stages (the usual repeated-
      trunk contract).
    - ``stage_params`` — pytree with leading stage axis S on every leaf
      (see :func:`stack_stage_params`).
    - ``x`` — (B, ...) full batch; split into M microbatches internally
      (default M = S, the GPipe sweet spot for memory ~ bubble tradeoffs).

    Returns (B, ...) outputs replicated over ``axis``.  Other mesh axes
    pass through untouched, so a (data, stage) mesh gives dp×pp: the batch
    axis stays sharded on 'data' outside, and this shard_map is only over
    'stage'.

    Differentiable: ``jax.grad`` through this call yields the standard
    1F1B-equivalent reverse schedule (autodiff of scan-of-ppermute).
    """
    n_stages = mesh.shape[axis]
    m = n_microbatch or n_stages
    x_mb = split_microbatches(x, m)

    # dp composition: split the microbatch's batch dim (axis 1) over every
    # OTHER mesh axis so each data row pipelines only its own shard —
    # without this the batch would replicate and every row would redo the
    # full work.  Falls back to replication when the shard doesn't divide.
    other = tuple(a for a in mesh.axis_names if a != axis and mesh.shape[a] > 1)
    n_other = int(np.prod([mesh.shape[a] for a in other])) if other else 1
    batch_spec = (
        P(None, other if len(other) > 1 else other[0])
        if other and x_mb.shape[1] % n_other == 0
        else P()
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), batch_spec),
        out_specs=batch_spec,
        check_vma=False,
    )
    def run(params, x_mb):
        # params arrive as the (1, ...) slice for THIS stage
        params = jax.tree_util.tree_map(lambda p: p[0], params)
        s_idx = jax.lax.axis_index(axis)
        shifts = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(carry, t):
            buf, outs = carry
            # stage 0 ingests microbatch t while t < M, else recycles
            # (clip keeps the gather in-bounds; the result is discarded)
            x0 = x_mb[jnp.clip(t, 0, m - 1)]
            inp = jnp.where(s_idx == 0, x0, buf)
            y = stage_fn(params, inp)
            # shift down the ring; stage 0 receives zeros (unsourced)
            nxt = jax.lax.ppermute(y, axis, shifts)
            # last stage emits microbatch t-(S-1) once the pipe is full
            o_idx = t - (n_stages - 1)
            c_idx = jnp.clip(o_idx, 0, m - 1)
            val = jnp.where(
                (s_idx == n_stages - 1) & (o_idx >= 0), y, outs[c_idx]
            )
            outs = jax.lax.dynamic_update_index_in_dim(outs, val, c_idx, 0)
            return (nxt, outs), None

        buf0 = jnp.zeros_like(x_mb[0])
        outs0 = jnp.zeros_like(x_mb)
        (_, outs), _ = jax.lax.scan(
            tick, (buf0, outs0), jnp.arange(m + n_stages - 1)
        )
        # valid only on the last stage → replicate over the stage ring
        outs = jnp.where(s_idx == n_stages - 1, outs, 0.0)
        return jax.lax.psum(outs, axis)

    outs = run(stage_params, x_mb)
    return outs.reshape((-1,) + outs.shape[2:])


# ---------------------------------------------------------------------------
# sequence parallelism: activation sharding along time
# ---------------------------------------------------------------------------

def shard_time(
    x: jax.Array, mesh: Mesh, axis: str = "seq", time_dim: int = 1
):
    """Constrain ``x``'s time dimension to shard over ``mesh[axis]``.

    Inside jit this is ``with_sharding_constraint`` — GSPMD propagates the
    layout through frame-local ops (mel projection, LayerNorm, FFN, CTC
    frame posteriors) and inserts an all-gather only where an op actually
    mixes time steps.  Degrades to identity when the axis is absent or
    doesn't divide T (ragged tails replicate instead of crashing).
    """
    if axis not in mesh.shape or x.ndim <= time_dim:
        return x
    if x.shape[time_dim] % mesh.shape[axis] != 0:
        return x
    spec = [None] * x.ndim
    spec[time_dim] = axis
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec))
    )


def pipeline_bubble_fraction(n_stages: int, n_microbatch: int) -> float:
    """Idle fraction of the GPipe schedule — for capacity planning."""
    return (n_stages - 1) / (n_microbatch + n_stages - 1)

"""Device mesh helpers.

The reference's distribution model is per-process DDP over
gloo/nccl rendezvous (ccml/trainer.py:358-380).  TPU-native: ONE program,
a ``jax.sharding.Mesh`` whose 'data' axis carries data parallelism (grad
all-reduce rides ICI) and whose optional 'model' axis is reserved for
tensor-parallel layouts.  Multi-host: ``jax.distributed.initialize`` is the
rendezvous (env:// analog); each process feeds its local shard.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host rendezvous (the env://(MASTER_ADDR/PORT) / tcp:// analog,
    ccml/trainer.py:67-80): wraps ``jax.distributed.initialize``.  On cloud
    TPU pods all three args auto-detect; explicit values mirror the
    reference's (init_method, world_size, rank) triple.  After this,
    ``jax.devices()`` spans every host and the same jit program runs SPMD —
    each process feeds its shard (MultiBatchSampler shard_id/num_shards)
    and rank-0 gating uses ``jax.process_index()``."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh.  data=None → all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch sharded along its leading axis.

    Single-process: a plain sharded device_put.  Multi-host: each
    process passes its LOCAL shard and the global array is assembled with
    ``make_array_from_process_local_data`` — a global device_put would
    treat every process's (different) local array as the same global
    value."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), sharding), batch
    )


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))

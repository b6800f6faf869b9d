"""Device mesh + sharding helpers for data-parallel training.

The reference is single-process single-GPU (SURVEY §2.3: no
torch.distributed anywhere); data parallelism over ICI is a new,
TPU-native capability: a 1-D `Mesh(('data',))`, batch sharded with
`NamedSharding(P('data'))`, params/opt-state replicated, and XLA's GSPMD
partitioner inserting the gradient all-reduce (psum over ICI). At the
~35M-param scale of these CNNs TP/PP would only add latency (SURVEY
§2.3), so DP is the whole story; a 'spatial' axis is provided for
sharding very large images across chips at inference if ever needed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up (`jax.distributed.initialize`): call once per
    host before building the mesh. No-ops in single-process runs. DCN
    carries only the input pipeline; gradient psum rides ICI."""
    import os
    if num_processes is None and "JAX_NUM_PROCESSES" not in os.environ \
            and coordinator_address is None:
        return  # single-process
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(data: int | None = None, spatial: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // spatial
    assert data * spatial <= len(devices), (
        f"mesh {data}x{spatial} needs more than {len(devices)} devices")
    dev = np.asarray(devices[:data * spatial]).reshape(data, spatial)
    return Mesh(dev, ("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put every array in a (possibly nested, tuple-keyed) batch
    dict with its batch axis over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, r), tree)

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


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the image-height axis (NHWC axis 1) over 'spatial'.

    Spatial parallelism for large-image / small-batch inference — the
    workload shape where data parallelism has nothing to split. Each
    chip holds a horizontal band of the image; XLA's GSPMD partitioner
    inserts the conv halo exchanges (collective-permute of the 1-2
    boundary rows per conv) and the cross-band collectives for the
    sparse decoder's global threshold max/min over ICI. Bit-identical
    to single-device execution (tests/test_spatial.py); uneven bands at
    deep strides are padded by GSPMD automatically.
    """
    return NamedSharding(mesh, P(None, "spatial"))


def shard_spatial(mesh: Mesh, x):
    """Device_put an NHWC image (or tree of them) height-sharded."""
    s = spatial_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), x)


def jit_spatial_forward(mesh: Mesh, forward, n_param_args: int = 2):
    """jit `forward(*params, image)` with the image height-sharded over
    'spatial' and params/outputs replicated. `n_param_args` leading
    arguments are parameter pytrees.

    The trace runs under a mesh context with spatial hints enabled
    (parallel/spatial_hints.py): decoder intermediates too short to
    band are constrained replicated, which turns GSPMD's involuntary
    rematerialization on the coarse-scale IDWT interleaves into planned
    replicate->slice transitions (round-2 dryrun tail)."""
    from . import spatial_hints
    rep = replicated(mesh)
    sp = spatial_sharding(mesh)

    def wrapped(*args):
        with spatial_hints.active("spatial"):
            return forward(*args)

    jf = jax.jit(wrapped, in_shardings=(rep,) * n_param_args + (sp,),
                 out_shardings=rep)

    def call(*args):
        with jax.sharding.set_mesh(mesh):   # P-specs resolve at trace
            return jf(*args)
    return call

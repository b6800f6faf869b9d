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
    host before building the mesh. No-ops in single-process runs (no
    coordinator given and none discoverable from the environment — on
    TPU pods jax.distributed.initialize() autodetects, so set
    JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES or pass flags explicitly
    elsewhere). DCN carries only the input pipeline; gradient psum
    rides ICI. On the CPU backend (multi-process tests) cross-process
    collectives need gloo, selected here before bring-up."""
    import os
    if (num_processes is None and coordinator_address is None
            and "JAX_NUM_PROCESSES" not in os.environ
            and "JAX_COORDINATOR_ADDRESS" not in os.environ):
        return  # single-process: nothing configured or discoverable
    if jax.config.jax_platforms == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=None if num_processes is None else int(num_processes),
        process_id=None if process_id is None else int(process_id))


def multihost_setup(batch_size: int, data_axis: int):
    """The per-process bring-up policy shared by both train CLIs:
    validates the global batch divides across processes AND across the
    data mesh it will be sharded over, computes the local feed size,
    and — multi-host only — pins the data axis to the FULL global
    device count: a partial data mesh cannot be fed from processes
    that own none of its devices (put_global would find no addressable
    shard). Explicit raises, not asserts: these guard CLI input and
    must survive `python -O`. Returns (local_batch, data_axis)."""
    nproc = jax.process_count()
    if batch_size % nproc:
        raise SystemExit(
            f"--batch_size {batch_size} must divide by {nproc} "
            "processes (each host feeds an equal local slice)")
    local_batch = batch_size // nproc
    if nproc > 1:
        ndev = jax.device_count()
        if data_axis > 1 and data_axis != ndev:
            raise SystemExit(
                f"--data_axis {data_axis} with {nproc} processes: a "
                f"multi-host data mesh must span all {ndev} global "
                "devices (processes owning none of the mesh's devices "
                "cannot feed it)")
        data_axis = ndev
    if data_axis > 1 and batch_size % data_axis:
        raise SystemExit(
            f"--batch_size {batch_size} must divide across the "
            f"{data_axis}-device data mesh (each device takes an equal "
            "slice of the global batch) — fail here, not deep inside "
            "the prefetch thread's device_put")
    return local_batch, data_axis


def agree_across_processes(value: int, what: str) -> int:
    """Assert an integer decision (e.g. the auto-resume epoch) is
    identical on every process and return it. Divergence means per-host
    state differs (typically a non-shared log_dir on auto-resume) —
    fail loudly NOW instead of hanging later when the hosts' step
    counts drift apart inside a collective."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils
    vals = np.asarray(
        multihost_utils.process_allgather(np.int32(value))).ravel()
    if not (vals == vals[0]).all():
        raise SystemExit(
            f"{what} disagrees across processes: {vals.tolist()} — "
            "multi-host runs need a shared log_dir (every host must "
            "see the same checkpoints)")
    return int(vals[0])


def warmup_collectives(mesh: Mesh) -> None:
    """Establish the cross-process collective clique with a trivial psum
    BEFORE any heavy compile. Gloo (CPU backend) initializes its context
    lazily at the FIRST collective execution with a hard ~30 s rendezvous
    deadline — if that first collective sits after a multi-minute
    train-step compile, process skew on a loaded host blows the deadline
    (`GetKeyValue() timed out`). A one-element all-reduce compiles in
    well under a second on every process, so the rendezvous happens while
    the processes are still in lockstep. No-op single-process; harmless
    (one tiny psum) on TPU pods."""
    if jax.process_count() == 1:
        return
    rows_per_proc = max(1, mesh.shape["data"] // jax.process_count())
    x = put_global(np.ones((rows_per_proc, 1), np.float32),
                   batch_sharding(mesh))
    total = jax.jit(jax.numpy.sum, out_shardings=replicated(mesh))(x)
    jax.block_until_ready(total)


def process_shard(items: list) -> list:
    """This process's shard of a split-file list (interleaved, so every
    process gets the same count within +-1 and the union is exact).
    Each host feeds only its own shard; the global batch is assembled
    device-side by `global_batch_sharding` puts. Single-process: the
    full list."""
    return list(items[jax.process_index()::jax.process_count()])


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


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for K-steps-per-dispatch super-batches (leaves
    [K, B, ...], data/loader.py stack_batches): the scan axis K is
    unsharded, the batch axis shards over 'data'."""
    return NamedSharding(mesh, P(None, "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(a, sharding):
    """Put one host array onto a (possibly multi-process) sharding.

    Single-process: plain device_put. Multi-process: the array is this
    process's LOCAL slice (its shard of the batch, or a full replica
    for replicated shardings) and the processes' slices are assembled
    into one global jax.Array — global batch = per-process batch x
    process_count, laid out so each host's rows land on its own
    addressable devices (no DCN traffic for the feed itself)."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, a)
    return jax.device_put(a, sharding)


def shard_batch(mesh: Mesh, batch):
    """Put every array in a (possibly nested, tuple-keyed) batch dict
    with its batch axis over 'data'. Multi-process safe (see
    put_global)."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: put_global(a, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: put_global(a, r), tree)


def local_rows(a):
    """This process's addressable rows of a (possibly multi-process)
    batch-sharded array, as one host array. Multi-host TB visual logging
    fetches these instead of the global array (whose remote shards are
    not addressable); single-process (all shards local) it is the full
    array, in order."""
    if not hasattr(a, "addressable_shards"):       # already a host array
        return np.asarray(a)
    if a.is_fully_replicated or jax.process_count() == 1:
        return np.asarray(a)
    shards = sorted(a.addressable_shards, key=lambda s: s.index[0].start
                    if s.index and s.index[0].start else 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def local_tree(tree):
    """local_rows over a batch/outputs pytree."""
    return jax.tree_util.tree_map(local_rows, tree)


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

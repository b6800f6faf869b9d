"""Worker process for tests/test_multihost.py — NOT a test module.

Brings up jax.distributed on the CPU backend (gloo collectives), takes
its interleaved shard of a fabricated split list, contributes its local
rows of a known global batch via `parallel.mesh.shard_batch`
(make_array_from_process_local_data under the hood), and runs two REAL
KITTI train steps on the resulting global mesh — the same wiring the
train CLIs use for multi-host (SURVEY §2.3: data parallelism over the
full device mesh, DCN only for the input pipeline). Writes its shard,
per-step losses, global batch dim, and a post-step param fingerprint as
JSON for the parent test to cross-check against a single-process run.
"""

import json
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import os                                                   # noqa: E402

_cache = os.environ.get("WMD_JAX_CACHE",
                        os.path.expanduser("~/.cache/wmd_jax_cache"))
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_path = sys.argv[3], sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "kitti"

    from wavelet_monodepth_tpu.parallel import mesh as mesh_lib
    mesh_lib.initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()

    if mode == "nyu":
        return main_nyu(pid, nproc, out_path)

    files = [f"item{i:02d}" for i in range(11)]
    shard = mesh_lib.process_shard(files)

    from wavelet_monodepth_tpu.train.kitti import (KittiTrainSetup,
                                                   synthetic_batch)
    from wavelet_monodepth_tpu.utils.config import KittiOptions
    opts = KittiOptions(use_stereo=True, frame_ids=(0,), use_wavelets=True,
                        height=64, width=96, scales=(0, 1, 2, 3),
                        loss_scales=(0, 1, 2, 3), num_layers=18,
                        batch_size=4, data_axis=jax.device_count())
    mesh = mesh_lib.make_mesh(data=opts.data_axis)
    # gloo's first-collective rendezvous has a 30 s deadline; establish
    # the clique before the multi-minute train-step compile
    mesh_lib.warmup_collectives(mesh)

    setup = KittiTrainSetup(opts, steps_per_epoch=10)
    state = setup.init_state(jax.random.PRNGKey(0))   # same on every host
    state = mesh_lib.replicate(mesh, state)

    # the deterministic global batch; this process feeds only its rows
    # (global device order groups by process, so process p owns the
    # contiguous row block [p*local : (p+1)*local])
    gbatch = synthetic_batch(opts, opts.batch_size)
    local = opts.batch_size // nproc
    sl = slice(pid * local, (pid + 1) * local)
    local_batch = jax.tree_util.tree_map(
        lambda a: np.asarray(a)[sl], gbatch)
    dev_batch = mesh_lib.shard_batch(mesh, local_batch)
    batch_dim = next(iter(jax.tree_util.tree_leaves(dev_batch))).shape[0]

    step_fn = setup.jit_train_step()
    losses = []
    for i in range(2):
        state, l = step_fn(state, dev_batch, jax.random.PRNGKey(i))
        losses.append(float(l["loss"]))

    # param fingerprint: global L2 of one updated kernel (replicated)
    k = state.params["encoder"]["stem"]["conv"]["kernel"]
    fingerprint = float(jax.numpy.sqrt(jax.numpy.sum(k * k)))

    # CLI bring-up helpers under real multi-process conditions
    local_b, axis = mesh_lib.multihost_setup(4, 1)
    assert (local_b, axis) == (4 // nproc, jax.device_count())
    assert mesh_lib.agree_across_processes(7, "probe") == 7
    try:  # a partial data mesh must be rejected under multi-host
        mesh_lib.multihost_setup(4, 2)
        bad_axis_rejected = False
    except SystemExit:
        bad_axis_rejected = True

    # orbax checkpointing is COLLECTIVE: every process calls save (the
    # rank-0-only gating this guards against deadlocks the pod) and
    # every process calls restore
    from wavelet_monodepth_tpu.utils.checkpoint import (load_checkpoint,
                                                        save_checkpoint)
    ckpt_dir = os.path.join(os.path.dirname(out_path), "ckpt_shared")
    folder = save_checkpoint(ckpt_dir, 0, state,
                             {"epoch": 0} if pid == 0 else None,
                             backend="orbax")
    restored = load_checkpoint(folder, state)
    rk = restored.params["encoder"]["stem"]["conv"]["kernel"]
    orbax_fingerprint = float(np.sqrt(np.sum(np.asarray(rk) ** 2)))

    with open(out_path, "w") as f:
        json.dump({"pid": pid, "shard": shard, "losses": losses,
                   "global_batch_dim": int(batch_dim),
                   "n_devices": jax.device_count(),
                   "fingerprint": fingerprint,
                   "bad_axis_rejected": bad_axis_rejected,
                   "orbax_fingerprint": orbax_fingerprint}, f)


def main_nyu(pid: int, nproc: int, out_path: str):
    """NYU variant: the exact multi-host path of tools/train_nyu.py —
    `process_shard(train_ds.pairs)` (`train_nyu.py:41-43`), global-batch
    assembly from per-process local rows, two lockstep supervised train
    steps, the auto-resume epoch agreement, and the collective orbax
    checkpoint. mobilenet_light encoder for CPU-compile speed — the
    DenseNet161 step is sharding-proven by __graft_entry__'s NYU dryrun
    leg and the wiring under test here is model-independent."""
    from wavelet_monodepth_tpu.parallel import mesh as mesh_lib
    from wavelet_monodepth_tpu.train.nyu import NyuTrainSetup
    from wavelet_monodepth_tpu.utils.config import NyuOptions

    # the (train==test, reference quirk) pair list sharding
    pairs = [(f"rgb_{i:02d}.png", f"depth_{i:02d}.png") for i in range(11)]
    shard = mesh_lib.process_shard(pairs)

    opts = NyuOptions(encoder_type="mobilenet_light", use_wavelets=True,
                      batch_size=4, data_axis=jax.device_count())
    mesh = mesh_lib.make_mesh(data=opts.data_axis)
    mesh_lib.warmup_collectives(mesh)

    setup = NyuTrainSetup(opts)
    setup.input_hw = (64, 96)
    setup.depth_hw = (32, 48)
    state = setup.init_state(jax.random.PRNGKey(0))  # same on every host
    state = mesh_lib.replicate(mesh, state)

    rng = np.random.RandomState(0)
    gimage = rng.rand(4, 64, 96, 3).astype(np.float32)
    gdepth = (rng.rand(4, 32, 48, 1) * 990 + 10).astype(np.float32)
    local = opts.batch_size // nproc
    sl = slice(pid * local, (pid + 1) * local)
    dev = mesh_lib.shard_batch(mesh, {"image": gimage[sl],
                                      "depth": gdepth[sl]})
    batch_dim = dev["image"].shape[0]

    step_fn = setup.jit_train_step()
    losses = []
    for _ in range(2):
        state, l = step_fn(state, dev["image"], dev["depth"])
        losses.append(float(l["loss"]))

    k = state.params["encoder"]["stem"]["conv"]["kernel"]
    fingerprint = float(jax.numpy.sqrt(jax.numpy.sum(k * k)))

    # train_nyu.py:57-69 auto-resume agreement + the collective orbax
    # save/restore every process must participate in
    assert mesh_lib.agree_across_processes(3, "auto-resume epoch") == 3
    from wavelet_monodepth_tpu.utils.checkpoint import (load_checkpoint,
                                                        save_checkpoint)
    ckpt_dir = os.path.join(os.path.dirname(out_path), "nyu_ckpt_shared")
    folder = save_checkpoint(ckpt_dir, 0, state,
                             {"epoch": 0} if pid == 0 else None,
                             backend="orbax")
    restored = load_checkpoint(folder, state)
    rk = restored.params["encoder"]["stem"]["conv"]["kernel"]
    orbax_fingerprint = float(np.sqrt(np.sum(np.asarray(rk) ** 2)))

    with open(out_path, "w") as f:
        json.dump({"pid": pid,
                   "shard": [list(p) for p in shard],
                   "losses": losses,
                   "global_batch_dim": int(batch_dim),
                   "n_devices": jax.device_count(),
                   "fingerprint": fingerprint,
                   "orbax_fingerprint": orbax_fingerprint}, f)


if __name__ == "__main__":
    main()

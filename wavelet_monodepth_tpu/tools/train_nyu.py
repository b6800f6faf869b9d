"""NYUv2 training CLI — `NYUv2/train.py:165-352` equivalent.

Usage:
  python -m wavelet_monodepth_tpu.tools.train_nyu --data_path \
      nyu_data.zip --use_wavelets --encoder_type densenet
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp


def main(argv=None):
    from ..data import nyu as nyu_data
    from ..train.nyu import NyuTrainSetup
    from ..utils import checkpoint as ckpt
    from ..utils.cache import enable_persistent_compile_cache
    from ..utils.config import parse_nyu_args
    from ..utils.logging import SummaryLogger

    enable_persistent_compile_cache()
    opts = parse_nyu_args(argv)
    log_path = os.path.join(opts.log_dir, opts.model_name)

    # multi-host bring-up (no-op single-process); each process keeps
    # only its interleaved shard of the (train==test, reference quirk)
    # pair list and feeds batch_size/nproc local rows per step
    from ..parallel import mesh as mesh_lib
    mesh_lib.initialize_distributed(opts.coordinator_address,
                                    opts.num_processes, opts.process_id)
    nproc, is_main = jax.process_count(), jax.process_index() == 0

    train_ds, test_ds = nyu_data.get_training_testing_data(
        opts.data_path, is_224=opts.use_224,
        uint8_feed=not opts.float_feed)
    n_train_global = len(train_ds)
    local_batch, opts.data_axis = mesh_lib.multihost_setup(
        opts.batch_size, opts.data_axis)
    if nproc > 1:
        train_ds.pairs = mesh_lib.process_shard(train_ds.pairs)
        test_ds.pairs = mesh_lib.process_shard(test_ds.pairs)
    setup = NyuTrainSetup(opts)
    # mesh + collective warmup BEFORE any heavy compile (init_state is a
    # multi-minute DenseNet161 compile): gloo's first-collective
    # rendezvous has a ~30 s deadline, so the clique must form while the
    # processes are still in lockstep (parallel/mesh.py
    # warmup_collectives; same ordering as train_kitti.py)
    mesh = None
    if opts.data_axis > 1:
        mesh = mesh_lib.make_mesh(data=opts.data_axis)
        mesh_lib.warmup_collectives(mesh)   # no-op single-process
    state = setup.init_state(jax.random.PRNGKey(0))
    start_epoch = 0
    resume_folder = opts.load_weights_folder
    if opts.auto_resume and not resume_folder:
        # crash/preemption recovery: pick up the newest weights_<epoch>
        # for this model_name and continue after it
        resume_folder = ckpt.latest_checkpoint(log_path)
        if resume_folder:
            start_epoch = int(
                os.path.basename(resume_folder).split("_")[1]) + 1
            print(f"auto-resume: restoring {resume_folder}, "
                  f"continuing at epoch {start_epoch}")
        # every host must resolve the SAME epoch (shared log_dir) or
        # the pod's step counts diverge — fail loudly, don't hang
        start_epoch = mesh_lib.agree_across_processes(
            start_epoch, "auto-resume epoch")
    if resume_folder:
        state = ckpt.load_checkpoint(resume_folder, state)

    if mesh is not None:
        state = mesh_lib.replicate(mesh, state)
    step_fn = setup.jit_train_step(mixed_precision=opts.bfloat16)
    eval_fn = jax.jit(setup.make_eval_step())

    logger = SummaryLogger(log_path) if is_main else None
    n_batches = n_train_global // opts.batch_size
    # threaded item loading (reference: DataLoader(num_workers),
    # `NYUv2/data.py:222-223`) + double-buffered host->device transfer
    from ..data.loader import parallel_batches
    from ..data.prefetch import to_device
    sharding = mesh_lib.batch_sharding(mesh) if mesh is not None else None
    train_iter = to_device(
        parallel_batches(train_ds, local_batch,
                         num_workers=opts.num_workers),
        sharding=sharding)
    val_iter = to_device(
        parallel_batches(test_ds, local_batch,
                         num_workers=opts.num_workers, shuffle=False),
        sharding=sharding)

    step = start_epoch * n_batches
    for epoch in range(start_epoch, opts.epochs):
        t_end = time.time()
        for i in range(n_batches):
            batch = next(train_iter)   # already on device, sharded
            image, depth = batch["image"], batch["depth"]
            state, losses = step_fn(state, image, depth)
            if i % 5 == 0 and is_main:
                bt = time.time() - t_end
                print(f"Epoch: [{epoch}][{i}/{n_batches}]\t"
                      f"Time {bt:.3f}\t Loss {float(losses['loss']):.4f}")
            if i % opts.log_frequency == 0:
                # collectives below run on EVERY process in lockstep;
                # only rank 0 writes TB
                from ..ops import augment
                from ..ops.wavelets import haar_dwt_J
                from ..train.nyu import depth_norm
                if is_main:
                    # one device_get overlaps per-leaf relay transfers
                    losses_host = jax.device_get(losses)
                    logger.scalars(
                        "train",
                        {k: float(v) for k, v in losses_host.items()},
                        step)
                # pred-vs-GT coefficient images + histograms
                # (`NYUv2/train.py:113-163`): re-forward through the
                # eval step at log time only. The uint8 feed expands
                # here on the host side for the visuals; eval_fn
                # expands internally.
                img_f, dep_f = augment.expand_nyu(image, depth, jnp)
                depth_n = (depth_norm(dep_f) if opts.disparity else dep_f)
                toutputs = eval_fn(state, image)
                gt_wav = (haar_dwt_J(depth_n, 4) if opts.use_wavelets
                          else None)
                if is_main:
                    logger.log_nyu_visuals(
                        "train", mesh_lib.local_rows(img_f),
                        mesh_lib.local_rows(depth_n),
                        mesh_lib.local_tree(toutputs),
                        mesh_lib.local_tree(gt_wav), step)
                vbatch = next(val_iter)
                outputs = eval_fn(state, jnp.asarray(vbatch["image"]))
                vimg_f, vdepth = augment.expand_nyu(
                    jnp.asarray(vbatch["image"]),
                    jnp.asarray(vbatch["depth"]), jnp)
                vdepth_n = (depth_norm(vdepth) if opts.disparity
                            else vdepth)
                vlosses = setup.compute_losses(outputs, vdepth_n)
                # the val GT DWT dispatches a program — run it on EVERY
                # process (lockstep invariant), log on rank 0 only
                vgt_wav = (haar_dwt_J(vdepth_n, 4) if opts.use_wavelets
                           else None)
                if is_main:
                    vlosses_host = jax.device_get(vlosses)
                    logger.scalars(
                        "val",
                        {k: float(v) for k, v in vlosses_host.items()},
                        step)
                    logger.log_nyu_visuals(
                        "val", mesh_lib.local_rows(vimg_f),
                        mesh_lib.local_rows(vdepth_n),
                        mesh_lib.local_tree(outputs),
                        mesh_lib.local_tree(vgt_wav), step)
            t_end = time.time()
            step += 1
        if is_main or opts.checkpoint_backend == "orbax":
            # orbax save has all-process barriers — EVERY process must
            # call it or the pod deadlocks; msgpack writes on rank 0
            # only. meta/opt.json are written once (rank 0).
            meta = {"epoch": epoch, "use_224": opts.use_224}
            folder = ckpt.save_checkpoint(
                log_path, epoch, state,
                meta if is_main else None, opts if is_main else None,
                backend=opts.checkpoint_backend)
            if is_main:
                print(f"saved checkpoint to {folder}")
    if logger is not None:
        logger.close()


if __name__ == "__main__":
    main()

"""KITTI training CLI — `KITTI/train.py` + the reference Trainer's epoch
loop (`trainer.py:182-229`), TPU-native: host loop over jitted sharded
steps, periodic one-batch validation (`trainer.py:312-327`), TensorBoard
logging, per-epoch checkpoints.

Usage:
  python -m wavelet_monodepth_tpu.tools.train_kitti --data_path ... \
      --use_stereo --frame_ids 0 --use_depth_hints --use_wavelets \
      --split eigen_full --model_name wavelets_r18
"""

from __future__ import annotations

import os
import time

import jax


def main(argv=None):
    from ..data import kitti as kitti_data
    from ..parallel import mesh as mesh_lib
    from ..train.kitti import KittiTrainSetup
    from ..utils import checkpoint as ckpt
    from ..utils.cache import enable_persistent_compile_cache
    from ..utils.config import parse_kitti_args
    from ..utils.logging import SummaryLogger, TrainTimer

    enable_persistent_compile_cache()
    opts = parse_kitti_args(argv)
    opts.validate_for_training()
    log_path = os.path.join(opts.log_dir, opts.model_name)

    # multi-host bring-up (no-op single-process). Each process then
    # loads only its interleaved shard of the split, feeds its local
    # rows, and the device_put assembles the global batch
    # (parallel/mesh.py put_global); gradient psum rides ICI.
    mesh_lib.initialize_distributed(opts.coordinator_address,
                                    opts.num_processes, opts.process_id)
    nproc, is_main = jax.process_count(), jax.process_index() == 0

    from ..data.splits import resolve_split_dir
    split_dir = resolve_split_dir(opts.split, opts.data_path)
    train_files = kitti_data.readlines(
        os.path.join(split_dir, "train_files.txt"))
    val_files = kitti_data.readlines(
        os.path.join(split_dir, "val_files.txt"))
    img_ext = ".png" if opts.png else ".jpg"

    # global sizes decide the (lockstep) step counts; each process
    # loads batch_size/nproc items of its own shard per step
    n_train_global, n_val_global = len(train_files), len(val_files)
    local_batch, opts.data_axis = mesh_lib.multihost_setup(
        opts.batch_size, opts.data_axis)
    if nproc > 1:
        train_files = mesh_lib.process_shard(train_files)
        val_files = mesh_lib.process_shard(val_files)

    frame_idxs = list(opts.all_frame_ids)
    # the step consumes color_aug only at scale 0 and (without
    # --v1_multiscale) samples non-center frames only at scale 0 —
    # don't build/ship what nothing reads (data/kitti.py item trimming)
    feed_kw = dict(
        is_train=True, img_ext=img_ext,
        use_depth_hints=opts.use_depth_hints,
        depth_hint_path=opts.depth_hint_path, dataset=opts.dataset,
        aug_scales=(0,),
        other_frame_scales=None if opts.v1_multiscale else (0,),
        device_augment=not opts.host_augment)
    train_ds = kitti_data.KittiRawDataset(
        opts.data_path, train_files, opts.height, opts.width, frame_idxs,
        list(opts.scales), **feed_kw)
    val_ds = kitti_data.KittiRawDataset(
        opts.data_path, val_files, opts.height, opts.width, frame_idxs,
        list(opts.scales), **dict(feed_kw, is_train=False))

    steps_per_epoch = n_train_global // opts.batch_size
    setup = KittiTrainSetup(opts, steps_per_epoch=steps_per_epoch)
    mesh = mesh_lib.make_mesh(data=opts.data_axis) \
        if opts.data_axis > 1 else None
    if mesh is not None:
        mesh_lib.warmup_collectives(mesh)   # no-op single-process

    rng = jax.random.PRNGKey(0)
    state = setup.init_state(rng)
    start_epoch = opts.start_epoch
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

    # K steps per dispatch (--steps_per_call): lax.scan of the step over
    # host-stacked batches amortizes per-dispatch runtime overhead
    # (train/kitti.py make_multi_train_step)
    K = opts.steps_per_call
    if K > 1:
        step_fn = setup.jit_multi_train_step(
            K, mixed_precision=opts.bfloat16)
        # one tiny program slices the last sub-batch out of a stacked
        # input for visuals/val — per-leaf host slicing would pay one
        # device round trip per leaf
        slice_last = jax.jit(lambda tree: jax.tree_util.tree_map(
            lambda x: x[-1], tree))
    else:
        step_fn = setup.jit_train_step(mixed_precision=opts.bfloat16)
    eval_fn = jax.jit(setup.make_eval_step())

    logger = SummaryLogger(log_path) if is_main else None
    effective_spe = (steps_per_epoch // K) * K   # drop-last when K > 1
    timer = TrainTimer(effective_spe * opts.num_epochs)

    # threaded item loading (reference: DataLoader(num_workers=12),
    # `trainer.py:128-139`) + double-buffered host->device transfer;
    # batches land pre-sharded on the data mesh when one is active
    from ..data.loader import parallel_batches, stack_batches
    from ..data.prefetch import to_device
    sharding = mesh_lib.batch_sharding(mesh) if mesh is not None else None
    train_src = parallel_batches(train_ds, local_batch,
                                 num_workers=opts.num_workers,
                                 shuffle=True)
    train_sharding = sharding
    if K > 1:
        train_src = stack_batches(train_src, K)
        train_sharding = (mesh_lib.stacked_batch_sharding(mesh)
                          if mesh is not None else None)
    train_iter = to_device(train_src, sharding=train_sharding)
    # val mirrors the reference's shuffled val DataLoader
    # (`trainer.py:136-138`), same worker pool size
    val_iter = to_device(
        parallel_batches(val_ds, local_batch,
                         num_workers=opts.num_workers, shuffle=True),
        sharding=sharding)

    if is_main:
        print(f"Training model named:\n   {opts.model_name}")
        print(f"There are {n_train_global} training and {n_val_global} "
              f"validation items")
    if is_main and K > 1 and steps_per_epoch % K:
        print(f"steps_per_call={K}: dropping {steps_per_epoch % K} "
              f"trailing steps/epoch (drop-last)")
    step = start_epoch * effective_spe
    for epoch in range(start_epoch, opts.num_epochs):
        for batch_idx0 in range(0, effective_spe, K):
            t0 = time.time()
            batch = next(train_iter)   # already on device, sharded
            durations = {"dataloading": time.time() - t0}
            t1 = time.time()
            rng, sub = jax.random.split(rng)
            state, losses = step_fn(state, batch, sub)
            durations["batch_process"] = time.time() - t1

            # log when the K-step window [batch_idx0, batch_idx0+K)
            # contains a log boundary (K=1 reduces to the plain
            # modulo conditions)
            batch_idx = batch_idx0 + K - 1       # last sub-step's index
            early = any((batch_idx0 + j) % opts.log_frequency == 0
                        for j in range(K)) and (
                            opts.log_always or step + K - 1 < 1000)
            late = any((step + j) % 1000 == 0 for j in range(K))
            if early or late:
                # scalars come off-device ONLY here: on the
                # relay-attached TPU every synchronous fetch pays a
                # 1-3 s round trip (PERF.md landmine #2) — a per-step
                # `float(loss)` made the wall rate 3-4x the device
                # step time (round-5 soak finding). One device_get of
                # the whole dict overlaps the per-leaf transfers.
                losses_host = jax.device_get(losses)
                if K > 1:   # per-sub-step values stacked on axis 0:
                    losses_host = {k: v[-1]     # log the last sub-step
                                   for k, v in losses_host.items()}
                loss = float(losses_host["loss"])
                vis_batch = slice_last(batch) if K > 1 else batch
                # the forwards below run collectives, so EVERY process
                # executes them in lockstep; only the TB/print side
                # effects are rank-0's (logger is a no-op elsewhere)
                if is_main:
                    print(timer.log_line(epoch, batch_idx,
                                         max(step + K - 1, 1),
                                         opts.batch_size, durations, loss))
                    logger.scalars(
                        "train",
                        {k: float(v) for k, v in losses_host.items()},
                        step + K - 1)
                # train-batch visuals (`trainer.py:661-720`): warped
                # predictions, automask, disparities, per-scale wavelet
                # coefficient images/histograms/min-max — re-forwarded
                # through the eval step so the jitted train step never
                # fetches image tensors off-device on non-log steps
                rng, sub = jax.random.split(rng)
                toutputs, _ = eval_fn(state, vis_batch, sub)
                if is_main:
                    logger.log_kitti_visuals(
                        "train", mesh_lib.local_tree(vis_batch),
                        mesh_lib.local_tree(toutputs), opts,
                        step + K - 1)
                # one-batch validation (`trainer.py:312-327`)
                vbatch = next(val_iter)
                rng, sub = jax.random.split(rng)
                voutputs, vlosses = eval_fn(state, vbatch, sub)
                if is_main:
                    vlosses_host = jax.device_get(vlosses)
                    logger.scalars(
                        "val",
                        {k: float(v) for k, v in vlosses_host.items()},
                        step + K - 1)
                    logger.log_kitti_visuals(
                        "val", mesh_lib.local_tree(vbatch),
                        mesh_lib.local_tree(voutputs), opts,
                        step + K - 1)
            step += K

        if (epoch + 1) % opts.save_frequency == 0 and (
                is_main or opts.checkpoint_backend == "orbax"):
            # orbax save has all-process barriers — EVERY process must
            # call it or the pod deadlocks; msgpack writes on rank 0
            # only. meta/opt.json are written once (rank 0).
            meta = {"height": opts.height, "width": opts.width,
                    "use_stereo": int(opts.use_stereo), "epoch": epoch}
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

"""KITTI eigen-split evaluation CLI — `KITTI/evaluate_depth.py` equivalent.

Loads a checkpoint (reference .pth via --torch_model_path or our msgpack
via --load_weights_folder), predicts disparities over the eval split
(dense with optional flip post-processing, or sparse with density/op
accounting), scores against gt_depths.npz, prints the 7-metric table.

Usage:
  python -m wavelet_monodepth_tpu.tools.evaluate_depth --data_path ... \
      --torch_model_path weights/ --eval_stereo --use_wavelets \
      [--use_sparse --threshold 0.05] [--post_process]
"""

from __future__ import annotations

import os

import numpy as np


def _load_forward(opts, torch_model_path):
    import jax
    import jax.numpy as jnp
    from ..models.factory import make_depth_decoder, make_depth_encoder

    encoder, num_ch_enc = make_depth_encoder(opts)
    decoder = make_depth_decoder(num_ch_enc, opts)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, opts.height, opts.width, 3), jnp.float32)
    enc_vars = encoder.init(rng, x)
    feats = encoder.apply(enc_vars, x)
    dec_vars = decoder.init(rng, feats)

    if torch_model_path:
        from . import torch_import as ti
        enc_sd = ti.load_pth(os.path.join(torch_model_path, "encoder.pth"))
        dec_sd = ti.load_pth(os.path.join(torch_model_path, "depth.pth"))
        enc_vars = ti.import_resnet_encoder(enc_sd, opts.num_layers)
        if opts.use_wavelets:
            dec_vars = ti.import_kitti_wavelet_decoder(dec_sd)
        else:
            dec_vars = ti.import_kitti_baseline_decoder(
                dec_sd, tuple(opts.scales))
    elif opts.load_weights_folder:
        import flax.serialization
        from ..utils.checkpoint import load_raw_state
        raw = load_raw_state(opts.load_weights_folder)
        enc_vars = {
            "params": flax.serialization.from_state_dict(
                enc_vars["params"], raw["params"]["encoder"]),
            "batch_stats": flax.serialization.from_state_dict(
                enc_vars["batch_stats"], raw["batch_stats"]["encoder"])}
        dec_vars = {"params": flax.serialization.from_state_dict(
            dec_vars["params"], raw["params"]["depth"])}

    if opts.bfloat16:
        from ..utils.precision import cast_floats
        enc_vars = cast_floats(enc_vars, jnp.bfloat16)
        dec_vars = cast_floats(dec_vars, jnp.bfloat16)

    import functools

    @functools.partial(jax.jit, static_argnames=("thresh",))
    def forward(image, thresh=None):
        if image.dtype == jnp.uint8:
            # uint8 eval feed: the cast rides the jit (4x smaller
            # host->device transfers; see ops/augment.py)
            image = image.astype(jnp.float32) / 255.0
            if opts.bfloat16:
                image = image.astype(jnp.bfloat16)
        feats = encoder.apply(enc_vars, image)
        if thresh is None or not opts.use_wavelets:
            return decoder.apply(dec_vars, feats)
        return decoder.apply(dec_vars, feats, thresh_ratio=thresh)

    if opts.bfloat16:
        from ..utils.precision import wrap_forward_bf16
        return wrap_forward_bf16(forward)
    return forward


def main(argv=None):
    from ..data import kitti as kitti_data
    from ..eval import kitti_eval
    from ..utils.config import parse_kitti_args

    opts = parse_kitti_args(argv)
    assert int(opts.eval_mono) + int(opts.eval_stereo) == 1, \
        "choose --eval_mono or --eval_stereo"

    from ..data.splits import resolve_split_dir
    split_dir = resolve_split_dir(opts.eval_split, opts.data_path)

    if opts.ext_disp_to_eval is None:
        files = kitti_data.readlines(
            os.path.join(split_dir, "test_files.txt"))
        torch_model_path = getattr(opts, "torch_model_path", None) or \
            os.environ.get("WMD_TORCH_MODEL_PATH")
        forward = _load_forward(opts, torch_model_path)

        # eval consumes scale 0 only — skip the 4-scale pyramid work.
        # Default feed is uint8 (the jitted forward casts on device —
        # 4x smaller transfers); --host_augment restores the f32 feed.
        u8 = not opts.host_augment
        ds = kitti_data.KittiRawDataset(
            opts.data_path, files, opts.height, opts.width, [0],
            target_scales=[0], is_train=False,
            img_ext=".png" if opts.png else ".jpg", device_augment=u8)

        def images():
            # dense AND sparse modes batch for throughput (per-image
            # thresholds/op counts keep batched sparse == sequential);
            # coefficient saving stays per-image like the reference
            coeff_mode = opts.save_pred_disps and opts.use_wavelets
            bs = 1 if coeff_mode else max(1, opts.batch_size)
            if opts.native_decode:
                # C++ threaded decode+resize (native/wmd_native.cpp):
                # the whole host feed in one call per batch
                from ..data import native_loader as nl
                paths = []
                for line in files:
                    parts = line.split()
                    folder = parts[0]
                    fidx = int(parts[1]) if len(parts) == 3 else 0
                    side = parts[2] if len(parts) == 3 else None
                    paths.append(ds.get_image_path(folder, fidx, side))
                decode = (nl.decode_resize_batch_u8 if u8
                          else nl.decode_resize_batch)
                for b0 in range(0, len(paths), bs):
                    yield decode(
                        paths[b0:b0 + bs], opts.height, opts.width,
                        num_threads=max(1, opts.num_workers))
                return
            key = ("color_u8", "0", 0) if u8 else ("color", "0", 0)
            buf = []
            for i in range(len(ds)):
                buf.append(ds[i][key])
                if len(buf) == bs:
                    yield np.stack(buf)
                    buf = []
            if buf:
                yield np.stack(buf)

        thresh = opts.threshold if (opts.use_sparse
                                    and opts.use_wavelets) else None
        pred_disps, info = kitti_eval.predict_disps(
            forward, images(), opts.min_depth, opts.max_depth,
            post_process=opts.post_process, sparse_threshold=thresh,
            collect_coeffs=(opts.save_pred_disps and opts.use_wavelets))
        if info:
            print(f"total_ops: mean {info['total_ops_mean'] / 1e9:2.3f} "
                  f"GFLOPs, density: {100 * info['density_mean']:.3f}%")
    else:
        print(f"-> Loading predictions from {opts.ext_disp_to_eval}")
        pred_disps = np.load(opts.ext_disp_to_eval)
        info = None

    if opts.save_pred_disps and opts.load_weights_folder:
        out = os.path.join(opts.load_weights_folder,
                           f"disps_{opts.eval_split}_split.npy")
        np.save(out, pred_disps)
        # per-scale 4-coefficient stacks (`evaluate_depth.py:231-235`)
        for s_, arr in (info or {}).get("coeffs", {}).items():
            np.save(os.path.join(
                opts.load_weights_folder,
                f"disps_coeffs_s{s_}_{opts.eval_split}_split.npy"), arr)

    if opts.no_eval:
        print("-> Evaluation disabled. Done.")
        return

    if opts.eval_split == "benchmark":
        # KITTI online-benchmark submission pngs
        # (`evaluate_depth.py:241-256`): no public GT, just export.
        import cv2
        save_dir = os.path.join(opts.load_weights_folder or ".",
                                "benchmark_predictions")
        os.makedirs(save_dir, exist_ok=True)
        for idx in range(len(pred_disps)):
            disp_resized = cv2.resize(pred_disps[idx], (1216, 352))
            depth = np.clip(
                kitti_eval.STEREO_SCALE_FACTOR / disp_resized, 0, 80)
            cv2.imwrite(os.path.join(save_dir, f"{idx:010d}.png"),
                        np.uint16(depth * 256))
        print(f"-> Saved benchmark predictions to {save_dir}; no GT "
              "available, not evaluating. Done.")
        return

    gt_path = os.path.join(split_dir, "gt_depths.npz")
    gt_depths = np.load(gt_path, fix_imports=True, encoding="latin1",
                        allow_pickle=True)["data"]
    mean_errors, ratios = kitti_eval.evaluate_disps(
        pred_disps, gt_depths, eval_split=opts.eval_split,
        eval_stereo=opts.eval_stereo,
        disable_median_scaling=opts.disable_median_scaling,
        pred_depth_scale_factor=opts.pred_depth_scale_factor)
    if len(ratios):
        med = np.median(ratios)
        print(f" Scaling ratios | med: {med:0.3f} | "
              f"std: {np.std(ratios / med):0.3f}")
    print(kitti_eval.format_result_table(mean_errors))
    print("\n-> Done!")
    # programmatic use (self-golden gate, tests): the 7-metric row plus
    # the sparse density/op accounting when it ran
    return {"metrics": dict(zip(
        ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"),
        (float(v) for v in mean_errors))),
        "ratios": np.asarray(ratios),
        "density_mean": (info or {}).get("density_mean"),
        "total_ops_mean": (info or {}).get("total_ops_mean")}


if __name__ == "__main__":
    main()

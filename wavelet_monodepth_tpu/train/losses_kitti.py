"""KITTI self-supervised losses: photometric reprojection with min-fusion
and automasking, depth-hints proxy supervision, edge-aware smoothness.

Functional rebuild of `KITTI/trainer.py:329-646` (generate_images_pred,
compute_reprojection_loss, compute_proxy_supervised_loss,
compute_loss_masks, compute_losses_hints, compute_losses_mdp). All NHWC,
jit-friendly (the automask tie-break noise takes an explicit PRNG key
instead of global torch randn, `trainer.py:515-518`).

Deliberate deviation: the reference's `compute_losses_mdp` never adds the
reprojection term into the total (only smoothness survives,
`trainer.py:622-641` — a bug; the hints path is the one the published
models use). Here `compute_losses_mdp` adds `to_optimise.mean()` like
monodepth2 proper.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.geometry import (backproject_depth, disp_to_depth, project_3d,
                            transformation_from_parameters)
from ..ops.image import get_smooth_loss, grid_sample_border, resize_bilinear
from ..ops.warp import grid_sample_border_banded
from ..ops.ssim import ssim as ssim_fn

Array = jnp.ndarray

# Width where the Pallas banded warp would overtake the XLA gather on a
# v5e. The 1024x320 banded win (2.2-2.8x, PERF.md round 3) was against
# the PRE-chunking gather, which was falling off XLA's large-operand
# gather cliff (root-caused round 3c: flat-operand SIZE, not width).
# With grid_sample_border's batch-chunked take (ops/image.py
# _TAKE_OPERAND_MAX_BYTES) the gather wins at EVERY measured shape:
# 640x192 1.3x (73.7 vs 84.1 ms/step b12), 832x256 1.3x, 1024x320 b6
# bf16-mp 112.4 vs banded 137.4 ms/step (same window, round 4; the
# round-3c window agreed at 127.1 vs 156.5). "auto" therefore always
# picks the gather; the banded kernel stays available via
# stereo_warp_kernel="on" (it partitions under the data mesh and may
# win on other generations — re-A/B before forcing it).
BANDED_WARP_MIN_WIDTH = float("inf")


def use_banded_warp(opts) -> bool:
    """Resolve stereo_warp_kernel: "auto" (or None) selects the banded
    Pallas warp for wide images, the flat-row gather below the
    crossover; "on"/"off" (or bools, for direct API use) force it."""
    v = getattr(opts, "stereo_warp_kernel", "auto")
    if isinstance(v, bool):
        return v
    if v in (None, "auto"):
        return opts.width >= BANDED_WARP_MIN_WIDTH
    if v in ("on", "true", "1"):
        return True
    if v in ("off", "false", "0"):
        return False
    raise ValueError(f"stereo_warp_kernel must be auto/on/off, got {v!r}")


def compute_reprojection_loss(pred: Array, target: Array,
                              no_ssim: bool = False) -> Array:
    """0.85*SSIM + 0.15*L1 per pixel, channel-meaned
    (`trainer.py:394-406`). Returns (N, H, W, 1)."""
    l1 = jnp.mean(jnp.abs(target - pred), axis=-1, keepdims=True)
    if no_ssim:
        return l1
    s = jnp.mean(ssim_fn(pred, target), axis=-1, keepdims=True)
    return 0.85 * s + 0.15 * l1


def generate_images_pred(inputs: Dict, outputs: Dict, opts,
                         pose_T: Optional[Dict] = None) -> Dict:
    """Warp source frames into the target view per loss scale
    (`trainer.py:329-392`). Adds ("depth", 0, s), ("color", fid, s) and,
    under depth hints, ("color_depth_hint", "s", 0) to outputs."""
    H, W = opts.height, opts.width
    frame_ids = opts.all_frame_ids
    # under a 'data' mesh the batch axis is sharded: the warp's
    # anti-cliff chunking must size takes per shard (ops/image.py)
    shards = getattr(opts, "data_axis", 1) or 1
    gather_sampler = functools.partial(grid_sample_border,
                                       batch_shards=shards)
    for scale in opts.loss_scales:
        disp = outputs[("disp", scale)]
        if opts.v1_multiscale:
            source_scale = scale
        else:
            disp = resize_bilinear(disp, H, W)
            source_scale = 0
        _, depth = disp_to_depth(disp, opts.min_depth, opts.max_depth)
        outputs[("depth", 0, scale)] = depth

        h = depth.shape[1]
        w = depth.shape[2]
        for frame_id in frame_ids[1:]:
            if frame_id == "s":
                T = inputs[("stereo_T",)]
                # rectified-stereo grids are row-banded; the Pallas
                # banded warp (ops/warp.py) is exact here. Width decides
                # the winner (see use_banded_warp) — PERF.md round 3.
                sampler = (grid_sample_border_banded
                           if use_banded_warp(opts)
                           else gather_sampler)
            else:
                T = pose_T[("cam_T_cam", 0, frame_id)]
                if opts.pose_model_type == "posecnn":
                    # velocity-scaled warp pose (`trainer.py:353-364`,
                    # "from the authors of arXiv:1712.00175"): recompute
                    # T per scale with the translation scaled by this
                    # scale's mean inverse depth. The reference indexes
                    # [:, 0] in BOTH pose modes (even 'all', where the
                    # stored cam_T_cam used [:, i]) — reproduced as-is.
                    # Temporal frames only: the reference would KeyError
                    # on ("axisangle", 0, "s"), which predict_poses
                    # never stores.
                    aa = pose_T[("axisangle", 0, frame_id)]
                    tr = pose_T[("translation", 0, frame_id)]
                    mean_inv_depth = jnp.mean(1.0 / depth, axis=(1, 2),
                                              keepdims=True)   # N,1,1,1
                    T = transformation_from_parameters(
                        aa[:, 0], tr[:, 0] * mean_inv_depth[:, 0],
                        invert=frame_id < 0)
                sampler = gather_sampler
            cam_points = backproject_depth(
                depth, inputs[("inv_K", source_scale)])
            pix = project_3d(cam_points, inputs[("K", source_scale)], T,
                             h, w)
            outputs[("sample", str(frame_id), scale)] = pix
            outputs[("color", str(frame_id), scale)] = sampler(
                inputs[("color", str(frame_id), source_scale)], pix)

    if opts.use_depth_hints and "s" in frame_ids[1:]:
        depth = inputs[("depth_hint",)]
        cam_points = backproject_depth(depth, inputs[("inv_K", 0)])
        pix = project_3d(cam_points, inputs[("K", 0)], inputs[("stereo_T",)],
                         depth.shape[1], depth.shape[2])
        sampler = (grid_sample_border_banded
                   if use_banded_warp(opts)
                   else gather_sampler)
        outputs[("color_depth_hint", "s", 0)] = sampler(
            inputs[("color", "s", 0)], pix)
    return outputs


def compute_proxy_supervised_loss(pred: Array, target: Array,
                                  valid_pixels: Array,
                                  loss_mask: Array) -> Array:
    """log(|t - p| + 1) hint loss, masked (`trainer.py:408-421`)."""
    loss = jnp.log(jnp.abs(target - pred) + 1.0) * valid_pixels
    return loss * loss_mask


def compute_loss_masks(reprojection_loss: Array,
                       identity_reprojection_loss: Optional[Array],
                       depth_hint_reprojection_loss: Optional[Array]):
    """Elementwise argmin over [reproj, identity, hint]
    (`trainer.py:423-455`). Returns (reprojection_loss_mask,
    depth_hint_loss_mask or None)."""
    if identity_reprojection_loss is None:
        reprojection_loss_mask = jnp.ones_like(reprojection_loss)
        depth_hint_loss_mask = None
        if depth_hint_reprojection_loss is not None:
            all_losses = jnp.concatenate(
                [reprojection_loss, depth_hint_reprojection_loss], axis=-1)
            idxs = jnp.argmin(all_losses, axis=-1, keepdims=True)
            depth_hint_loss_mask = (idxs == 1).astype(
                reprojection_loss.dtype)
        return reprojection_loss_mask, depth_hint_loss_mask

    parts = [reprojection_loss, identity_reprojection_loss]
    if depth_hint_reprojection_loss is not None:
        parts.append(depth_hint_reprojection_loss)
    idxs = jnp.argmin(jnp.concatenate(parts, axis=-1), axis=-1,
                      keepdims=True)
    reprojection_loss_mask = (idxs != 1).astype(reprojection_loss.dtype)
    depth_hint_loss_mask = ((idxs == 2).astype(reprojection_loss.dtype)
                            if depth_hint_reprojection_loss is not None
                            else None)
    return reprojection_loss_mask, depth_hint_loss_mask


def compute_losses_hints(inputs: Dict, outputs: Dict, opts,
                         rng: jax.Array) -> Dict:
    """Reprojection + proxy-hint + smoothness (`trainer.py:457-560`)."""
    losses = {}
    total_loss = 0.0
    frame_ids = opts.all_frame_ids

    if opts.use_depth_hints:
        pred = outputs[("color_depth_hint", "s", 0)]
        hint_reproj = compute_reprojection_loss(
            pred, inputs[("color", "0", 0)], opts.no_ssim)
        hint_reproj = hint_reproj + 1000.0 * (1.0 -
                                              inputs[("depth_hint_mask",)])
    else:
        hint_reproj = None

    for scale in opts.loss_scales:
        source_scale = scale if opts.v1_multiscale else 0
        disp = outputs[("disp", scale)]
        color = inputs[("color", "0", scale)]
        target = inputs[("color", "0", source_scale)]

        reproj = [compute_reprojection_loss(
            outputs[("color", str(fid), scale)], target, opts.no_ssim)
            for fid in frame_ids[1:]]
        reproj = jnp.concatenate(reproj, axis=-1)

        if not opts.disable_automasking:
            ident = [compute_reprojection_loss(
                inputs[("color", str(fid), source_scale)], target, opts.no_ssim)
                for fid in frame_ids[1:]]
            ident = jnp.concatenate(ident, axis=-1)
            if opts.avg_reprojection:
                ident = jnp.mean(ident, axis=-1, keepdims=True)
            else:
                ident = jnp.min(ident, axis=-1, keepdims=True)
        else:
            ident = None

        if opts.avg_reprojection:
            reproj = jnp.mean(reproj, axis=-1, keepdims=True)
        else:
            reproj = jnp.min(reproj, axis=-1, keepdims=True)

        if ident is not None:
            rng, sub = jax.random.split(rng)
            ident = ident + jax.random.normal(sub, ident.shape,
                                              ident.dtype) * 1e-5

        reproj_mask, hint_mask = compute_loss_masks(reproj, ident,
                                                    hint_reproj)
        reproj_term = jnp.sum(reproj * reproj_mask) / (
            jnp.sum(reproj_mask) + 1e-7)
        losses[f"reproj_loss/{scale}"] = reproj_term
        outputs[("identity_selection", scale)] = 1.0 - reproj_mask

        hint_term = 0.0
        if opts.use_depth_hints:
            hint_loss = compute_proxy_supervised_loss(
                outputs[("depth", 0, scale)], inputs[("depth_hint",)],
                inputs[("depth_hint_mask",)], hint_mask)
            hint_term = jnp.sum(hint_loss) / (jnp.sum(hint_mask) + 1e-7)
            outputs[("depth_hint_pixels", scale)] = hint_mask
            losses[f"depth_hint_loss/{scale}"] = hint_term

        loss = reproj_term + hint_term

        # opt-in scratch-training stabilizer (NOT in the reference, see
        # utils/config.py hint_disp_l1_weight / DEVIATIONS.md): masked L1
        # in sigmoid-disparity space against the loader's ("disp_hint",).
        # The reference's log-depth hint gradient scales ~depth^2, which
        # drags a scratch init onto a depth rail; this term's gradient is
        # bounded. Applied wherever the hint mask is valid (no argmin
        # gating — it must hold the solution in-basin even where the
        # photometric term currently wins).
        w_disp = getattr(opts, "hint_disp_l1_weight", 0.0)
        if opts.use_depth_hints and w_disp:
            dh = inputs[("disp_hint",)]
            mask = inputs[("depth_hint_mask",)]
            disp_full = (disp if disp.shape[1:3] == dh.shape[1:3]
                         else resize_bilinear(disp, dh.shape[1],
                                              dh.shape[2]))
            if getattr(opts, "hint_disp_l1_space", "log") == "log":
                # scale-invariant: relative disparity (== relative
                # depth) error, gradient bounded by 1/c
                c = 0.02
                l1 = jnp.abs(jnp.log(disp_full + c)
                             - jnp.log(dh + c)) * mask
            else:
                l1 = jnp.abs(disp_full - dh) * mask
            disp_term = w_disp * jnp.sum(l1) / (jnp.sum(mask) + 1e-7)
            losses[f"hint_disp_l1/{scale}"] = disp_term
            loss = loss + disp_term

        mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
        norm_disp = disp / (mean_disp + 1e-7)
        smooth = get_smooth_loss(norm_disp, color, opts.smoothness_gamma)
        loss = loss + opts.disparity_smoothness * smooth / (2.0 ** scale)

        total_loss += loss
        losses[f"loss/{scale}"] = loss

    total_loss = total_loss / len(opts.scales)
    losses["loss"] = total_loss
    return losses


def compute_losses_mdp(inputs: Dict, outputs: Dict, opts,
                       rng: jax.Array) -> Dict:
    """Monodepth2-style loss without hints (`trainer.py:562-646`; the
    reference drops the reprojection term from the total — fixed here,
    see module docstring)."""
    losses = {}
    total_loss = 0.0
    frame_ids = opts.all_frame_ids

    for scale in opts.loss_scales:
        source_scale = scale if (opts.v1_multiscale or scale <= 0) else 0
        if ("disp", scale) not in outputs:
            continue
        disp = outputs[("disp", scale)]
        color = inputs[("color", "0", scale)]
        target = inputs[("color", "0", source_scale)]

        reproj = jnp.concatenate(
            [compute_reprojection_loss(outputs[("color", str(fid), scale)],
                                       target, opts.no_ssim)
             for fid in frame_ids[1:]], axis=-1)
        if opts.avg_reprojection:
            reproj = jnp.mean(reproj, axis=-1, keepdims=True)

        if not opts.disable_automasking:
            ident = jnp.concatenate(
                [compute_reprojection_loss(
                    inputs[("color", str(fid), source_scale)], target,
                    opts.no_ssim) for fid in frame_ids[1:]], axis=-1)
            if opts.avg_reprojection:
                ident = jnp.mean(ident, axis=-1, keepdims=True)
            rng, sub = jax.random.split(rng)
            ident = ident + jax.random.normal(sub, ident.shape,
                                              ident.dtype) * 1e-5
            combined = jnp.concatenate([ident, reproj], axis=-1)
        else:
            combined = reproj

        if combined.shape[-1] == 1:
            to_optimise = combined[..., 0]
        else:
            to_optimise = jnp.min(combined, axis=-1)
            idxs = jnp.argmin(combined, axis=-1)
            if not opts.disable_automasking:
                outputs[("identity_selection", scale)] = (
                    idxs >= ident.shape[-1]).astype(disp.dtype)

        loss = jnp.mean(to_optimise)

        mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
        norm_disp = disp / (mean_disp + 1e-7)
        if opts.disparity_smoothness != 0:
            smooth = get_smooth_loss(norm_disp, color,
                                     opts.smoothness_gamma)
            loss = loss + (opts.disparity_smoothness * smooth
                           / (2.0 ** scale))
        total_loss += loss
        losses[f"loss/{scale}"] = loss

    total_loss = total_loss / len(opts.scales)
    losses["loss"] = total_loss
    return losses

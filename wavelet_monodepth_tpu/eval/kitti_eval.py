"""KITTI eigen-split depth evaluation.

Rebuild of `KITTI/evaluate_depth.py:37-328`: model-driven disparity
prediction (dense with optional flip post-processing, or sparse batch-1
double forward with density/op accounting), then the scoring loop —
resize to GT, 1/disp, eigen crop, x5.4 stereo scale or per-image median
scaling, clamp to [1e-3, 80], 7-metric table.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import disp_to_depth
from ..ops.metrics import compute_errors_np
from ..ops.sparse import compute_density

MIN_DEPTH = 1e-3
MAX_DEPTH = 80.0
STEREO_SCALE_FACTOR = 5.4   # 0.1 nominal baseline vs 54cm KITTI rig


def batch_post_process_disparity(l_disp: np.ndarray,
                                 r_disp: np.ndarray) -> np.ndarray:
    """Monodepth v1 flip fusion (`evaluate_depth.py:71-79`)."""
    _, h, w = l_disp.shape
    m_disp = 0.5 * (l_disp + r_disp)
    l_grid, _ = np.meshgrid(np.linspace(0, 1, w), np.linspace(0, 1, h))
    l_mask = (1.0 - np.clip(20 * (l_grid - 0.05), 0, 1))[None, ...]
    r_mask = l_mask[:, :, ::-1]
    return (r_mask * l_disp + l_mask * r_disp
            + (1.0 - l_mask - r_mask) * m_disp)


def predict_disps(forward: Callable, images: Iterable[np.ndarray],
                  min_depth: float = 0.1, max_depth: float = 100.0,
                  post_process: bool = False,
                  sparse_threshold: Optional[float] = None,
                  collect_coeffs: bool = False):
    """Run the model over eval images (NHWC float arrays in [0,1]).

    forward(image_batch, thresh_ratio or None) -> decoder output dict.
    Returns (pred_disps (N,H,W), info dict with per-image total_ops /
    densities when sparse, and per-scale coefficient stacks when
    collect_coeffs — the `--save_pred_disps --use_wavelets` surface of
    `evaluate_depth.py:197-235`). Sparse mode mirrors the reference's
    double forward on the flipped input (`evaluate_depth.py:173-188`),
    batched: thresholds and op counts are per-image, so a batched sparse
    decode equals N sequential batch-1 decodes (tested).
    """
    disps = []
    total_ops = []
    densities = []
    coeffs = {s: [] for s in range(4)} if collect_coeffs else None
    for img in images:
        if img.ndim == 3:
            img = img[None]
        # uint8 feeds ship as-is (the jitted forward casts on device);
        # anything else normalizes to f32 as before
        x = (jnp.asarray(img) if img.dtype == np.uint8
             else jnp.asarray(img, jnp.float32))
        if sparse_threshold is not None:
            out = forward(x, sparse_threshold)
            d, _ = disp_to_depth(out[("disp", 0)], min_depth, max_depth)
            total_ops.extend(
                np.ravel(np.asarray(out[("total_ops", -1)])).tolist())
            densities.extend(
                np.ravel(np.asarray(compute_density(
                    out, per_image=True))).tolist())
            d = np.asarray(d)[..., 0]
            if post_process:
                # the reference's sparse path always runs the flipped
                # second forward but only FUSES under post_process —
                # without it the two-row pred_disp crashes its assembly
                # (`evaluate_depth.py:173-206`), so sparse + flip-fusion
                # is the only runnable reference combination. Here
                # post_process=False honestly does one forward (ops
                # counted once) instead of crashing.
                out_f = forward(jnp.flip(x, axis=2), sparse_threshold)
                df, _ = disp_to_depth(out_f[("disp", 0)], min_depth,
                                      max_depth)
                total_ops.extend(
                    np.ravel(np.asarray(out_f[("total_ops", -1)])).tolist())
                df = np.asarray(df)[..., 0]
                d = batch_post_process_disparity(d, df[:, :, ::-1])
        else:
            if post_process:
                x = jnp.concatenate([x, jnp.flip(x, axis=2)], axis=0)
            out = forward(x, None)
            d, _ = disp_to_depth(out[("disp", 0)], min_depth, max_depth)
            d = np.asarray(d)[..., 0]
            if post_process:
                n = d.shape[0] // 2
                d = batch_post_process_disparity(d[:n], d[n:, :, ::-1])
        if coeffs is not None:
            for s in range(4):
                if ("wavelets", s, "LL") in out and \
                        out[("wavelets", s, "LL")] is not None:
                    per = np.stack([
                        np.asarray(out[("wavelets", s, c)])[0, :, :, 0]
                        for c in ("LL", "LH", "HL", "HH")], axis=0)
                    coeffs[s].append(per)
        disps.append(d)
    info = {}
    if coeffs is not None:
        info["coeffs"] = {s: np.stack(v) for s, v in coeffs.items() if v}
    if total_ops:
        info["total_ops_mean"] = float(np.mean(total_ops))
        info["density_mean"] = float(np.mean(densities))
    return np.concatenate(disps, axis=0), info


def eigen_crop_mask(gt_depth: np.ndarray) -> np.ndarray:
    """Garg/eigen crop (`evaluate_depth.py:283-290`)."""
    gt_height, gt_width = gt_depth.shape[:2]
    mask = np.logical_and(gt_depth > MIN_DEPTH, gt_depth < MAX_DEPTH)
    crop = np.array([0.40810811 * gt_height, 0.99189189 * gt_height,
                     0.03594771 * gt_width, 0.96405229 * gt_width]
                    ).astype(np.int32)
    crop_mask = np.zeros(mask.shape)
    crop_mask[crop[0]:crop[1], crop[2]:crop[3]] = 1
    return np.logical_and(mask, crop_mask)


def evaluate_disps(pred_disps: np.ndarray, gt_depths,
                   eval_split: str = "eigen",
                   eval_stereo: Optional[bool] = None,
                   disable_median_scaling: Optional[bool] = None,
                   pred_depth_scale_factor: Optional[float] = None):
    """Score predicted disparities against GT depth maps
    (`evaluate_depth.py:258-317`). Returns (mean_errors[7], ratios).

    eval_stereo is REQUIRED, like the reference's --eval_mono/
    --eval_stereo assert (`evaluate_depth.py:88-89`): a silent default
    would x5.4-scale mono predictions (or median-scale stereo ones)
    into plausible-looking but wrong metrics."""
    import cv2
    if eval_stereo is None:
        raise ValueError("choose mono or stereo evaluation: pass "
                         "eval_stereo=True (x5.4 scaling, no median "
                         "scaling) or eval_stereo=False (median "
                         "scaling)")
    if eval_stereo:
        disable_median_scaling = True
        pred_depth_scale_factor = STEREO_SCALE_FACTOR
    else:
        disable_median_scaling = bool(disable_median_scaling)
        pred_depth_scale_factor = (1.0 if pred_depth_scale_factor is None
                                   else pred_depth_scale_factor)

    errors = []
    ratios = []
    for i in range(pred_disps.shape[0]):
        gt_depth = np.asarray(gt_depths[i])
        gt_h, gt_w = gt_depth.shape[:2]
        pred_disp = cv2.resize(pred_disps[i], (gt_w, gt_h))
        pred_depth = 1.0 / pred_disp

        if eval_split == "eigen":
            mask = eigen_crop_mask(gt_depth)
        else:
            mask = gt_depth > 0

        pred_depth = pred_depth[mask]
        gt = gt_depth[mask]
        pred_depth *= pred_depth_scale_factor
        if not disable_median_scaling:
            ratio = np.median(gt) / np.median(pred_depth)
            ratios.append(ratio)
            pred_depth *= ratio
        pred_depth = np.clip(pred_depth, MIN_DEPTH, MAX_DEPTH)
        errors.append(compute_errors_np(gt, pred_depth))

    return np.array(errors).mean(0), np.array(ratios)


def format_result_table(mean_errors) -> str:
    """`evaluate_depth.py:316-317`."""
    header = ("{:>8} | " * 7).format("abs_rel", "sq_rel", "rmse",
                                     "rmse_log", "a1", "a2", "a3")
    row = ("&{: 8.4f}  " * 7).format(*list(mean_errors)) + "\\\\"
    return "\n  " + header + "\n" + row

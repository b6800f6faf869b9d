"""NYUv2 labeled-set evaluation with edge (depth-boundary) metrics.

Rebuild of `NYUv2/evaluate.py:19-107` + `NYUv2/utils.py:85-272`:
border-crop 16 -> bilinear resize to 640x480 (align_corners=True) ->
model forward (dense or sparse) -> /100 cm->m (or DepthNorm in disparity
mode) -> the reference's downscale/replicate-pad/x2-upscale dance ->
clamp [0.4, 10] -> Eigen crop [20:460, 24:616] -> metrics.

Edge metrics: Canny on the normalized prediction vs NYUv2-OC++ GT edges,
truncated chamfer distances -> (eps_acc, eps_comp). The reference uses
skimage.feature.canny (`utils.py:137`); skimage is not available here so
ops-level Canny (gaussian -> Sobel -> 4-direction NMS -> hysteresis) is
implemented below — thresholds and sigma match, small numeric deviations
in edge placement are possible.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
from scipy import ndimage

EIGEN_CROP = (20, 459, 24, 615)   # `evaluate.py:56`


def canny(img: np.ndarray, sigma: float = np.sqrt(2),
          low_threshold: float = 0.15,
          high_threshold: float = 0.3) -> np.ndarray:
    """Canny edge detector on a float image (absolute thresholds on
    gradient magnitude, skimage-compatible conventions)."""
    smoothed = ndimage.gaussian_filter(img.astype(np.float64), sigma)
    gx = ndimage.sobel(smoothed, axis=1)
    gy = ndimage.sobel(smoothed, axis=0)
    mag = np.hypot(gx, gy)
    if mag.max() == 0:
        return np.zeros_like(img, dtype=bool)

    # non-maximum suppression over 4 quantized directions
    angle = np.rad2deg(np.arctan2(gy, gx)) % 180.0
    nms = np.zeros_like(mag)
    pad = np.pad(mag, 1, mode="constant")
    h, w = mag.shape
    ys, xs = np.mgrid[0:h, 0:w]
    dir_bins = ((angle + 22.5) // 45).astype(int) % 4
    offsets = {0: (0, 1), 1: (-1, 1), 2: (-1, 0), 3: (-1, -1)}
    for b, (dy, dx) in offsets.items():
        sel = dir_bins == b
        n1 = pad[ys + 1 + dy, xs + 1 + dx]
        n2 = pad[ys + 1 - dy, xs + 1 - dx]
        keep = sel & (mag >= n1) & (mag >= n2)
        nms[keep] = mag[keep]

    strong = nms >= high_threshold
    weak = nms >= low_threshold
    # hysteresis: keep weak pixels connected to strong ones
    edges = ndimage.binary_propagation(strong, mask=weak)
    return edges


def compute_depth_boundary_error(edges_gt: np.ndarray, pred: np.ndarray,
                                 mask: Optional[np.ndarray] = None,
                                 low_thresh: float = 0.15,
                                 high_thresh: float = 0.3):
    """Truncated chamfer accuracy/completeness of predicted depth edges
    (`NYUv2/utils.py:122-169`). Returns (dbe_acc, dbe_com, edges_est)."""
    if np.sum(edges_gt) == 0:
        return np.nan, np.nan, np.zeros(pred.shape, dtype=int)

    pred_n = pred.copy().astype("f")
    pred_n[pred_n == 0] = np.nan
    pred_n = pred_n - np.nanmin(pred_n)
    pred_n = pred_n / np.nanmax(pred_n)

    edges_est = canny(np.nan_to_num(pred_n), sigma=np.sqrt(2),
                      low_threshold=low_thresh,
                      high_threshold=high_thresh)

    D_gt = ndimage.distance_transform_edt(1 - edges_gt)
    D_est = ndimage.distance_transform_edt(1 - edges_est)
    max_dist_thr = 10.0

    mask_D_gt = D_gt < max_dist_thr
    E_fin_est_filt = edges_est * mask_D_gt
    if mask is not None:
        E_fin_est_filt = E_fin_est_filt * mask
        D_gt = D_gt * mask

    if np.sum(E_fin_est_filt) == 0:
        return max_dist_thr, max_dist_thr, edges_est

    dbe_acc = np.nansum(D_gt * E_fin_est_filt) / np.nansum(E_fin_est_filt)
    ch1 = np.minimum(D_gt * edges_est, max_dist_thr)
    ch2 = np.minimum(D_est * edges_gt, max_dist_thr)
    dbe_com = (np.nansum(ch1 + ch2)
               / (np.nansum(edges_est) + np.nansum(edges_gt)))
    return dbe_acc, dbe_com, edges_est


def compute_errors_nyu(gt: np.ndarray, pred: np.ndarray):
    """(abs_rel, rmse, log10, a1, a2, a3) — `NYUv2/utils.py:85-98`."""
    thresh = np.maximum(gt / pred, pred / gt)
    a1 = (thresh < 1.25).mean()
    a2 = (thresh < 1.25 ** 2).mean()
    a3 = (thresh < 1.25 ** 3).mean()
    abs_rel = np.mean(np.abs(gt - pred) / gt)
    rmse = np.sqrt(((gt - pred) ** 2).mean())
    log10 = np.mean(np.abs(np.log10(gt) - np.log10(pred)))
    return abs_rel, rmse, log10, a1, a2, a3


def save_outputs_pickle(outputs: dict, pred: np.ndarray, save_dir: str,
                        idx: int):
    """Per-image wavelet/prediction dump (`NYUv2/utils.py:231-248`)."""
    import os
    import pickle
    to_save = {("disp", 0): np.asarray(outputs[("disp", 0)])[0]}
    k = ("wavelets", 2, "LL")
    if k in outputs:
        to_save[k] = np.asarray(outputs[k])[0]
    for scale in range(3):
        for c in ("LH", "HL", "HH"):
            kk = ("wavelets", scale, c)
            if kk in outputs:
                to_save[kk] = np.asarray(outputs[kk])[0, :, :, 0]
    to_save["pred_depth"] = pred
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, f"results_{idx}.pickle"), "wb") as f:
        pickle.dump(to_save, f)


def predict_depth(forward: Callable, rgb_uint8: np.ndarray,
                  use_disparity: bool = False, use_224: bool = False,
                  sparse_threshold: Optional[float] = None,
                  border_crop: int = 16,
                  return_outputs: bool = False):
    """One eval image (H, W, 3 uint8) -> clamped metric depth (480, 640)
    following `NYUv2/utils.py:183-229` exactly."""
    import jax.numpy as jnp
    from ..ops.image import pad2d, resize_bilinear

    x = rgb_uint8[border_crop:-border_crop, border_crop:-border_crop, :]
    x = jnp.asarray(x, jnp.float32)[None] / 255.0
    tgt = (224, 224) if use_224 else (480, 640)
    x = resize_bilinear(x, *tgt, align_corners=True)

    out = forward(x, sparse_threshold)
    pred = out[("disp", 0)]
    if use_disparity:
        pred = (1000.0 / pred) / 10000.0
    else:
        pred = pred / 100.0

    if not use_224:
        pred = resize_bilinear(pred, 240 - border_crop, 320 - border_crop,
                               align_corners=True)
        pred = pad2d(pred, border_crop // 2, "replicate")
        pred = resize_bilinear(pred, pred.shape[1] * 2, pred.shape[2] * 2,
                               align_corners=True)
    pred = jnp.clip(pred, 0.4, 10.0)
    pred_np = np.asarray(pred)[0, :, :, 0]
    if return_outputs:
        return pred_np, out
    return pred_np


def evaluate(forward: Callable, rgbs: np.ndarray, depths: np.ndarray,
             edges_gt: Optional[np.ndarray] = None,
             use_disparity: bool = False, use_224: bool = False,
             sparse_threshold: Optional[float] = None,
             crop=EIGEN_CROP, save_wavelets_dir: Optional[str] = None):
    """Full labeled-set evaluation loop (batch-1 per image like the
    reference, `utils.py:306-318`). Returns dict of mean metrics."""
    preds = []
    gts = []
    edge_scores = []
    for i in range(rgbs.shape[0]):
        if save_wavelets_dir:
            pred, outs = predict_depth(forward, rgbs[i], use_disparity,
                                       use_224, sparse_threshold,
                                       return_outputs=True)
            save_outputs_pickle(outs, pred, save_wavelets_dir, i)
        else:
            pred = predict_depth(forward, rgbs[i], use_disparity,
                                 use_224, sparse_threshold)
        if not use_224:
            gt = depths[i][crop[0]:crop[1] + 1, crop[2]:crop[3] + 1]
            pc = pred[crop[0]:crop[1] + 1, crop[2]:crop[3] + 1]
        else:
            gt, pc = depths[i], pred
        preds.append(pc)
        gts.append(gt)
        if edges_gt is not None:
            acc, com, _ = compute_depth_boundary_error(
                edges_gt[i][crop[0]:crop[1] + 1, crop[2]:crop[3] + 1], pc)
            edge_scores.append((acc, com))

    pred_all = np.stack(preds)
    gt_all = np.stack(gts)
    abs_rel, rmse, log10, a1, a2, a3 = compute_errors_nyu(gt_all, pred_all)
    result = dict(abs_rel=abs_rel, rmse=rmse, log10=log10,
                  a1=a1, a2=a2, a3=a3)
    if edge_scores:
        es = np.asarray(edge_scores, dtype=np.float64)
        result["eps_acc"] = float(np.nanmean(es[:, 0]))
        result["eps_comp"] = float(np.nanmean(es[:, 1]))
    return result


def load_nyu_labeled(mat_path: str, splits_path: str):
    """h5py load of nyu_depth_v2_labeled.mat + official test indices
    (`evaluate.py:58-68`). Returns (rgb uint8 (N,480,640,3),
    depth float (N,480,640))."""
    import h5py
    from scipy import io as sio
    with h5py.File(mat_path, "r") as f:
        rgb = np.asarray(f["images"])      # (N, 3, W, H) in mat order
        depth = np.asarray(f["depths"])    # (N, W, H)
    splits = sio.loadmat(splits_path)
    test_idx = splits["testNdxs"].ravel().astype(int) - 1
    rgb = rgb[test_idx].transpose(0, 3, 2, 1)      # -> (N, 480, 640, 3)
    depth = depth[test_idx].transpose(0, 2, 1)     # -> (N, 480, 640)
    return rgb.astype(np.uint8), depth.astype(np.float32)

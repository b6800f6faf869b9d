"""TensorBoard + console logging.

Equivalent of the reference's tensorboardX usage (`trainer.py:141-143,
661-720`; `NYUv2/train.py:113-163`): separate train/val writers, loss
scalars, up to 4 images per batch (inputs, warps, automask, disparity),
per-scale wavelet coefficient images/histograms/min-max scalars —
the coefficient histograms are diagnostically load-bearing for sparsity
behavior (SURVEY §5.5) and are kept.
"""

from __future__ import annotations

import os
import time
from typing import Dict

import numpy as np


def _to_np(x) -> np.ndarray:
    return np.asarray(x)


def normalize_image_np(x: np.ndarray) -> np.ndarray:
    mi, ma = x.min(), x.max()
    return (x - mi) / (ma - mi + 1e-5)


class SummaryLogger:
    """Thin wrapper; becomes a no-op if tensorboardX is unavailable."""

    def __init__(self, log_path: str, modes=("train", "val")):
        self.writers = {}
        try:
            from tensorboardX import SummaryWriter
            for m in modes:
                self.writers[m] = SummaryWriter(os.path.join(log_path, m))
        except ImportError:
            pass

    def scalars(self, mode: str, scalars: Dict[str, float], step: int):
        w = self.writers.get(mode)
        if w is None:
            return
        for k, v in scalars.items():
            w.add_scalar(str(k), float(v), step)

    def image(self, mode: str, tag: str, img_hwc: np.ndarray, step: int):
        w = self.writers.get(mode)
        if w is None:
            return
        img = _to_np(img_hwc)
        if img.ndim == 3:
            img = img.transpose(2, 0, 1)
        elif img.ndim == 2:        # masks/automasks land channel-less
            img = img[None]
        w.add_image(tag, img, step)

    def histogram(self, mode: str, tag: str, values, step: int):
        w = self.writers.get(mode)
        if w is None:
            return
        w.add_histogram(tag, _to_np(values), step)

    def log_kitti_visuals(self, mode: str, inputs: Dict, outputs: Dict,
                          opts, step: int, max_images: int = 4):
        """`trainer.py:661-720` image set."""
        w = self.writers.get(mode)
        if w is None:
            return
        n = min(max_images, next(iter(inputs.values())).shape[0])
        for j in range(n):
            for fid in opts.all_frame_ids:
                key = ("color", str(fid), 0)
                if key in inputs:
                    self.image(mode, f"color_{fid}_0/{j}",
                               _to_np(inputs[key][j]), step)
                elif ("color_u8", str(fid), 0) in inputs:
                    # uint8 device-augment feed (data/kitti.py)
                    self.image(mode, f"color_{fid}_0/{j}",
                               _to_np(inputs[("color_u8", str(fid),
                                              0)][j]).astype("float32")
                               / 255.0, step)
                okey = ("color", str(fid), 0)
                if okey in outputs:
                    self.image(mode, f"color_pred_{fid}_0/{j}",
                               _to_np(outputs[okey][j]), step)
            for scale in opts.scales:
                sel = ("identity_selection", scale)
                if sel in outputs:
                    self.image(mode, f"automask_{scale}/{j}",
                               _to_np(outputs[sel][j]), step)
                if opts.use_wavelets:
                    for coeff in ("LL", "LH", "HL", "HH"):
                        key = ("wavelets", scale, coeff)
                        if key in outputs and outputs[key] is not None:
                            img = _to_np(outputs[key][j])
                            self.image(mode, f"{coeff}_{scale}/{j}",
                                       normalize_image_np(
                                           img.mean(-1, keepdims=True)),
                                       step)
                            self.histogram(mode,
                                           f"hist_{coeff}_{scale}/{j}",
                                           img, step)
                            self.scalars(mode,
                                         {f"min/{coeff}_{scale}/{j}":
                                              img.min(),
                                          f"max/{coeff}_{scale}/{j}":
                                              img.max()}, step)
                dkey = ("disp", scale)
                if dkey in outputs:
                    self.image(mode, f"disp_{scale}/{j}",
                               normalize_image_np(
                                   _to_np(outputs[dkey][j])), step)
            # depth-hint visuals at scale 0 / frame "s"
            # (`trainer.py:685-696`): hint-selected pixels, the hint
            # disparity itself, and the hint-warped color
            if getattr(opts, "use_depth_hints", False):
                if ("depth_hint_pixels", 0) in outputs:
                    self.image(mode, f"depth_hints_mask0/{j}",
                               _to_np(outputs[("depth_hint_pixels",
                                               0)][j]), step)
                if ("disp_hint",) in inputs:
                    self.image(mode, f"disp_hints/{j}",
                               normalize_image_np(
                                   _to_np(inputs[("disp_hint",)][j])),
                               step)
                if ("color_depth_hint", "s", 0) in outputs:
                    self.image(mode, f"color_depth_hint0/{j}",
                               _to_np(outputs[("color_depth_hint",
                                               "s", 0)][j]), step)

    def log_nyu_visuals(self, mode: str, image, depth_n, outputs: Dict,
                        gt_wavelets=None, step: int = 0,
                        max_images: int = 4, log_histogram: bool = True):
        """`NYUv2/train.py:113-163` image set: input color, GT disparity,
        per-scale predicted disparities, and pred-vs-GT wavelet
        coefficient images (+histograms). `gt_wavelets` is the
        (yl, [(lh, hl, hh) per level, finest first]) pair from
        ops.wavelets.haar_dwt_J(depth_n, 4) — level index == scale, the
        reference's `yh_gt[scale]` keying (`train.py:299-302`)."""
        w = self.writers.get(mode)
        if w is None:
            return
        image = _to_np(image)
        depth_n = _to_np(depth_n)
        n = min(max_images, image.shape[0])
        for j in range(n):
            self.image(mode, f"color/{j}", image[j], step)
            self.image(mode, f"disp_0_gt/{j}",
                       normalize_image_np(depth_n[j]), step)
            for scale in range(4):
                dkey = ("disp", scale)
                if dkey in outputs:
                    self.image(mode, f"disp_{scale}_pred/{j}",
                               normalize_image_np(
                                   _to_np(outputs[dkey][j])), step)
                coeffs = [("LH", 0), ("HL", 1), ("HH", 2)]
                if scale == 3:
                    coeffs = coeffs + [("LL", None)]
                for coeff, ci in coeffs:
                    key = ("wavelets", scale, coeff)
                    if key not in outputs or outputs[key] is None:
                        continue
                    pred = _to_np(outputs[key][j])
                    self.image(mode, f"{coeff}_{scale}_pred/{j}",
                               normalize_image_np(pred), step)
                    if log_histogram:
                        self.histogram(mode,
                                       f"hist_{coeff}_{scale}_pred/{j}",
                                       pred, step)
                    if gt_wavelets is None:
                        continue
                    yl_gt, highs = gt_wavelets
                    gt = (_to_np(yl_gt[j]) if ci is None
                          else _to_np(highs[scale][ci][j]))
                    self.image(mode, f"{coeff}_{scale}_gt/{j}",
                               normalize_image_np(gt), step)
                    if log_histogram:
                        self.histogram(mode,
                                       f"hist_{coeff}_{scale}_gt/{j}",
                                       gt, step)

    def close(self):
        for w in self.writers.values():
            w.close()


def sec_to_hm_str(t: float) -> str:
    """`KITTI/utils.py:37-48`."""
    t = int(t)
    s = t % 60
    t //= 60
    m = t % 60
    t //= 60
    return f"{t:02d}h{m:02d}m{s:02d}s"


class TrainTimer:
    """Wall-clock stage timing like `trainer.py:202-226`.

    examples/s is the WINDOWED wall rate (steps since the previous log
    line over the wall time since then), not batch/durations: steps
    dispatch asynchronously and scalars are fetched only on log steps
    (train_kitti.py), so per-step durations no longer measure the true
    rate on the relay-attached backend."""

    def __init__(self, num_total_steps: int):
        self.start_time = time.time()
        self.num_total_steps = num_total_steps
        self._last_log_time = self.start_time
        self._last_log_step = 0

    def log_line(self, epoch: int, batch_idx: int, step: int,
                 batch_size: int, durations: Dict[str, float],
                 loss: float) -> str:
        now = time.time()
        dsteps = max(step - self._last_log_step, 1)
        samples_per_sec = (batch_size * dsteps
                           / max(now - self._last_log_time, 1e-9))
        self._last_log_time, self._last_log_step = now, step
        elapsed = time.time() - self.start_time
        left = (self.num_total_steps / step - 1.0) * elapsed if step else 0
        return (f"epoch {epoch:>3} | batch {batch_idx:>6} | "
                f"forward: {durations.get('batch_process', 0):2.1f}s "
                f"(examples/s: {samples_per_sec:5.1f}) | "
                f"dataloading: {durations.get('dataloading', 0):2.1f}s | "
                f"loss: {loss:.5f} | elapsed: {sec_to_hm_str(elapsed)} | "
                f"left: {sec_to_hm_str(left)}")

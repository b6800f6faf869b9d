"""Depth-hints precompute — `KITTI/precompute_depth_hints.py:42-297`
equivalent ('fused SGM' from the Depth Hints paper).

For every training frame: run 12 OpenCV StereoSGBM matchers (4 disparity
ranges x 3 block sizes), convert pixel disparities to depth with the
normalized focal and the 0.1 nominal baseline, then pick per-pixel the
depth whose stereo reprojection (backproject -> project into the other
view -> bilinear sample -> SSIM+L1) has the lowest error. Saves one
(1, H, W) .npy per frame under <save_path>/<folder>/image_0{2,3}/.

Offline CPU tool — SGBM stays on OpenCV (SURVEY §2.2: not on the TPU
critical path); the fusion math reuses the framework's tested jax ops.

Usage:
  python -m wavelet_monodepth_tpu.tools.precompute_depth_hints \
      --data_path kitti_data --filenames splits/eigen_full/train_files.txt
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def generate_stereo_matchers():
    """12 SGBM configs (`precompute_depth_hints.py:42-63`)."""
    import cv2
    matchers = []
    for blockSize in [1, 2, 3]:
        for numDisparity in [64, 96, 128, 160]:
            sad = 3
            matchers.append(cv2.StereoSGBM_create(
                preFilterCap=63, P1=sad * sad * 4, P2=sad * sad * 32,
                minDisparity=0, numDisparities=numDisparity,
                uniquenessRatio=10, speckleWindowSize=100,
                speckleRange=16, blockSize=blockSize))
    return matchers


K_NORM = np.array([[0.58, 0, 0.5, 0],
                   [0, 1.92, 0.5, 0],
                   [0, 0, 1, 0],
                   [0, 0, 0, 1]], dtype=np.float32)
BASELINE = 0.1


def compute_depths(matchers, base_image, lookup_image, width,
                   reverse=False):
    """12 SGBM disparity maps -> depths (12, H, W)
    (`precompute_depth_hints.py:127-151`)."""
    import cv2
    if reverse:
        base_image = base_image[:, ::-1]
        lookup_image = lookup_image[:, ::-1]
    gray_b = cv2.cvtColor(base_image, cv2.COLOR_RGB2GRAY)
    gray_l = cv2.cvtColor(lookup_image, cv2.COLOR_RGB2GRAY)
    disps = []
    for m in matchers:
        disp = m.compute(gray_b, gray_l).astype(np.float32) / 16.0
        if reverse:
            disp = disp[:, ::-1]
        disps.append(disp)
    disps = np.stack(disps)
    focal = K_NORM[0, 0] * width
    depths = focal * BASELINE / (disps + 1e-7) * (disps > 0)
    return depths.astype(np.float32)


def fuse_depths(depths: np.ndarray, base_image: np.ndarray,
                lookup_image: np.ndarray, baseline_sign: int):
    """Per-pixel best-of-12 by reprojection loss
    (`precompute_depth_hints.py:243-249`), using the framework's geometry
    and SSIM ops."""
    import jax.numpy as jnp
    from ..ops.geometry import backproject_depth, project_3d
    from ..ops.image import grid_sample_border
    from ..ops.ssim import ssim

    n, h, w = depths.shape
    K = K_NORM.copy()
    K[0, :] *= w
    K[1, :] *= h
    invK = np.linalg.pinv(K)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = baseline_sign * BASELINE

    d = jnp.asarray(depths)[..., None]                     # (12, H, W, 1)
    Kb = jnp.tile(jnp.asarray(K)[None], (n, 1, 1))
    invKb = jnp.tile(jnp.asarray(invK)[None], (n, 1, 1))
    Tb = jnp.tile(jnp.asarray(T)[None], (n, 1, 1))
    base = jnp.tile(jnp.asarray(base_image, jnp.float32)[None] / 255.0,
                    (n, 1, 1, 1))
    lookup = jnp.tile(jnp.asarray(lookup_image, jnp.float32)[None] / 255.0,
                      (n, 1, 1, 1))

    pts = backproject_depth(d, invKb)
    pix = project_3d(pts, Kb, Tb, h, w)
    warped = grid_sample_border(lookup, pix)
    l1 = jnp.mean(jnp.abs(warped - base), axis=-1, keepdims=True)
    s = jnp.mean(ssim(warped, base), axis=-1, keepdims=True)
    losses = 0.85 * s + 0.15 * l1                           # (12, H, W, 1)
    best = jnp.argmin(losses[..., 0], axis=0)               # (H, W)
    best_depth = jnp.take_along_axis(
        jnp.asarray(depths), np.asarray(best)[None], axis=0)[0]
    return np.asarray(best_depth, np.float32)


def main(argv=None):
    from ..data.kitti import readlines

    p = argparse.ArgumentParser(description="precompute_depth_hints")
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--filenames", type=str, required=True)
    p.add_argument("--save_path", type=str, default=None)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--overwrite_saved_depths", action="store_true")
    p.add_argument("--num_workers", type=int, default=4,
                   help="thread pool over files: cv2 decode + the 12 "
                        "SGBM matchers release the GIL (the reference "
                        "parallelizes the same stage with DataLoader "
                        "workers, precompute_depth_hints.py:222)")
    args = p.parse_args(argv)

    import cv2
    cv2.setNumThreads(0)
    save_path = args.save_path or os.path.join(args.data_path,
                                               "depth_hints")
    files = readlines(args.filenames)
    print(f"Computing depth hints for {len(files)} files...")

    def process(line, matchers):
        folder, frame, side = line.split()
        frame = int(frame)
        side_folder = "image_02" if side == "l" else "image_03"
        other_folder = "image_03" if side == "l" else "image_02"
        out_dir = os.path.join(save_path, folder, side_folder)
        out_file = os.path.join(out_dir, f"{frame:010d}.npy")
        if os.path.exists(out_file) and not args.overwrite_saved_depths:
            return

        def load(img_folder):
            path = os.path.join(args.data_path, folder,
                                f"{img_folder}/data", f"{frame:010d}.jpg")
            if not os.path.exists(path):
                path = path[:-4] + ".png"
            img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
            return cv2.resize(img, (args.width, args.height))

        base = load(side_folder)
        lookup = load(other_folder)
        depths = compute_depths(matchers, base, lookup, args.width,
                                reverse=(side == "r"))
        # side 'l' -> -baseline, 'r' -> +baseline
        # (`precompute_depth_hints.py:160-174`, matches mono_dataset's
        # side_sign convention)
        baseline_sign = -1 if side == "l" else 1
        best = fuse_depths(depths, base, lookup, baseline_sign)

        os.makedirs(out_dir, exist_ok=True)
        np.save(out_file, best[None])

    t0 = time.time()
    nw = max(1, args.num_workers)
    if nw == 1:
        matchers = generate_stereo_matchers()
        for i, line in enumerate(files):
            process(line, matchers)
            if i % 50 == 0 and i > 0:
                dt = time.time() - t0
                print(f"image {i}/{len(files)}  imgs/s: {i / dt:.2f}")
    else:
        # cv2 StereoSGBM objects are not thread-safe: one matcher set
        # per worker thread
        import threading
        from concurrent.futures import ThreadPoolExecutor
        tls = threading.local()

        def worker(line):
            if not hasattr(tls, "matchers"):
                tls.matchers = generate_stereo_matchers()
            process(line, tls.matchers)

        with ThreadPoolExecutor(max_workers=nw) as pool:
            for i, _ in enumerate(pool.map(worker, files)):
                if i % 50 == 0 and i > 0:
                    dt = time.time() - t0
                    print(f"image {i}/{len(files)}  imgs/s: "
                          f"{i / dt:.2f}")
    print("done.")


if __name__ == "__main__":
    main()

"""Probe: is the photometric optimum at the geometric truth?

Loads a few items from a synthetic mount, warps the stereo frame with
depth = hint_depth * s for a ladder of scalars s, and reports the
reprojection loss (masked to valid hint pixels) per s. The fabricated
hints are geometrically EXACT (data/synth.py), so if the rendered pair
/ loader conventions (K at each scale, stereo_T=+-0.1, NHWC warp) are
mutually consistent, the loss must be minimized at s=1.0. A shifted
minimum quantifies a geometry mismatch and explains why training drags
disparity away from the hints (round-5 self-golden finding: tune-mount
median eval ratio 4.12 instead of 5.4, plateau abs_rel ~0.55).

Run: python tools_dev/warp_scale_probe.py [mount] [HxW]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    mount = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sg_tune/mount"
    hw = sys.argv[2] if len(sys.argv) > 2 else "96x320"
    H, W = (int(v) for v in hw.split("x"))

    from wavelet_monodepth_tpu.data.kitti import KittiRawDataset, readlines
    from wavelet_monodepth_tpu.data.splits import resolve_split_dir
    from wavelet_monodepth_tpu.data.kitti import batch_iterator
    from wavelet_monodepth_tpu.train.losses_kitti import (
        compute_reprojection_loss)
    from wavelet_monodepth_tpu.ops.geometry import (
        backproject_depth, project_3d)
    from wavelet_monodepth_tpu.ops.image import grid_sample_border

    split_dir = resolve_split_dir("eigen", mount)
    files = readlines(os.path.join(split_dir, "train_files.txt"))[:4]
    ds = KittiRawDataset(mount, files, H, W, frame_idxs=(0, "s"),
                         is_train=False, use_depth_hints=True)
    batch = next(batch_iterator(ds, 4, shuffle=False, drop_last=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    depth_h = batch[("depth_hint",)]
    mask = batch[("depth_hint_mask",)]
    tgt = batch[("color", "0", 0)]
    src = batch[("color", "s", 0)]
    print(f"hint depth range {float(depth_h.min()):.3f}.."
          f"{float(depth_h.max()):.3f} mask frac {float(mask.mean()):.3f}")

    def loss_at(s):
        d = depth_h * s
        cam = backproject_depth(d, batch[("inv_K", 0)])
        pix = project_3d(cam, batch[("K", 0)], batch[("stereo_T",)], H, W)
        warped = grid_sample_border(src, pix)
        rl = compute_reprojection_loss(warped, tgt)
        return float((rl * mask).sum() / mask.sum())

    ladder = [0.25, 0.4, 0.55, 0.7, 0.8, 0.9, 0.95, 1.0, 1.05, 1.1,
              1.2, 1.35, 1.55, 1.8, 2.2, 2.8, 3.5]
    rows = [(s, loss_at(s)) for s in ladder]
    best = min(rows, key=lambda r: r[1])
    for s, l in rows:
        star = " <-- min" if (s, l) == best else ""
        print(f"s={s:5.2f}  reproj={l:.6f}{star}")
    print(f"[probe] argmin s = {best[0]} "
          f"({'CONSISTENT' if abs(best[0] - 1.0) < 0.11 else 'MISMATCH'})")


if __name__ == "__main__":
    main()

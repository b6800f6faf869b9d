"""Smoke test for the SGBM depth-hints tool on a synthetic stereo pair
(`KITTI/precompute_depth_hints.py:42-63,243-249` equivalent).

A textured plane at constant disparity D is rendered into a rectified
left/right pair (left(x) = right(x - D)); the 12 SGBM matchers must
recover D, and the reprojection-loss fusion must (a) be at least as
good as every single matcher, and (b) reject decoy depth candidates at
0.5x/2x the true depth — which fails if the warp geometry or baseline
sign is wrong, since argmin then cannot discriminate. (Writing this test
caught exactly that: the tool originally passed +baseline for side 'l';
the reference uses -baseline, `precompute_depth_hints.py:160-174`.)
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from wavelet_monodepth_tpu.tools import precompute_depth_hints as ph


W, H, D = 512, 128, 24
GT_DEPTH = ph.K_NORM[0, 0] * W * ph.BASELINE / D
# columns < numDisparities(160) + D can't match in every config; crop them
CROP = (slice(16, -16), slice(190, -16))


def _stereo_pair(seed=0):
    rng = np.random.default_rng(seed)
    tex = np.zeros((H, W + D), np.float32)
    for sig, amp in ((1.0, 1.0), (3.0, 2.0), (8.0, 4.0)):   # multi-scale
        noise = rng.uniform(-1, 1, (H, W + D)).astype(np.float32)
        tex += amp * cv2.GaussianBlur(noise, (0, 0), sig)
    tex = cv2.normalize(tex, None, 0, 255, cv2.NORM_MINMAX)
    tex3 = np.stack([tex] * 3, -1).astype(np.uint8)
    return tex3[:, :-D], tex3[:, D:]          # left, right


def test_sgbm_matchers_recover_disparity():
    left, right = _stereo_pair()
    matchers = ph.generate_stereo_matchers()
    assert len(matchers) == 12
    depths = ph.compute_depths(matchers, left, right, W)
    assert depths.shape == (12, H, W)
    for i in range(12):
        d = depths[i][CROP]
        valid = d > 0
        assert valid.mean() > 0.9, f"matcher {i} mostly invalid"
        med = np.median(d[valid])
        assert abs(med - GT_DEPTH) / GT_DEPTH < 0.05, (i, med, GT_DEPTH)


def _reproj_losses(dmaps, base_image, lookup_image):
    """Same loss pipeline as fuse_depths, exposed for assertions."""
    import jax.numpy as jnp
    from wavelet_monodepth_tpu.ops.geometry import (backproject_depth,
                                                    project_3d)
    from wavelet_monodepth_tpu.ops.image import grid_sample_border
    from wavelet_monodepth_tpu.ops.ssim import ssim
    n, h, w = dmaps.shape
    K = ph.K_NORM.copy()
    K[0, :] *= w
    K[1, :] *= h
    invK = np.linalg.pinv(K)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = -ph.BASELINE          # side 'l' convention
    d = jnp.asarray(dmaps)[..., None]
    Kb = jnp.tile(jnp.asarray(K)[None], (n, 1, 1))
    invKb = jnp.tile(jnp.asarray(invK)[None], (n, 1, 1))
    Tb = jnp.tile(jnp.asarray(T)[None], (n, 1, 1))
    base = jnp.tile(
        jnp.asarray(base_image, jnp.float32)[None] / 255.0, (n, 1, 1, 1))
    lookup = jnp.tile(
        jnp.asarray(lookup_image, jnp.float32)[None] / 255.0, (n, 1, 1, 1))
    pts = backproject_depth(d, invKb)
    pix = project_3d(pts, Kb, Tb, h, w)
    warped = grid_sample_border(lookup, pix)
    l1 = jnp.mean(jnp.abs(warped - base), axis=-1)
    s = jnp.mean(ssim(warped, base), axis=-1)
    return np.asarray(0.85 * s + 0.15 * l1)


def test_fusion_beats_every_single_matcher():
    left, right = _stereo_pair()
    depths = ph.compute_depths(ph.generate_stereo_matchers(), left, right, W)
    fused = ph.fuse_depths(depths, left, right, baseline_sign=-1)
    assert fused.shape == (H, W)

    fused_loss = float(np.mean(_reproj_losses(fused[None], left,
                                              right)[0][CROP]))
    for i in range(12):
        single = float(np.mean(_reproj_losses(depths[i][None], left,
                                              right)[0][CROP]))
        assert fused_loss <= single + 1e-6, (i, fused_loss, single)

    crop = fused[CROP]
    valid = crop > 0
    assert valid.mean() > 0.9
    med = np.median(crop[valid])
    assert abs(med - GT_DEPTH) / GT_DEPTH < 0.05, (med, GT_DEPTH)


def test_fusion_rejects_decoy_depths():
    """The reprojection argmin must prefer the true depth over planes at
    0.5x and 2x — this is what breaks if the warp direction/baseline sign
    in fuse_depths is wrong."""
    left, right = _stereo_pair()
    true_plane = np.full((H, W), GT_DEPTH, np.float32)
    candidates = np.stack([0.5 * true_plane, true_plane, 2.0 * true_plane])
    fused = ph.fuse_depths(candidates, left, right, baseline_sign=-1)
    frac_true = np.mean(np.abs(fused[CROP] - GT_DEPTH) < 1e-5)
    assert frac_true > 0.95, frac_true


def test_precompute_cli_end_to_end(tmp_path):
    """tools/precompute_depth_hints.main on a fabricated two-file
    stereo tree, threaded (num_workers=2): hints land at the dataset's
    expected path with plausible depths."""
    import os
    left, right = _stereo_pair(seed=1)
    drive = "2011_09_26/2011_09_26_drive_0009_sync"
    for sub, img in (("image_02", left), ("image_03", right)):
        d = tmp_path / drive / sub / "data"
        d.mkdir(parents=True)
        for f in range(2):
            cv2.imwrite(str(d / f"{f:010d}.jpg"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    split = tmp_path / "files.txt"
    split.write_text(f"{drive} 0 l\n{drive} 1 l\n")

    ph.main(["--data_path", str(tmp_path), "--filenames", str(split),
             "--height", str(H), "--width", str(W), "--num_workers",
             "2"])
    for f in range(2):
        out = (tmp_path / "depth_hints" / drive / "image_02" /
               f"{f:010d}.npy")
        assert out.exists()
        depth = np.load(out)
        assert depth.shape == (1, H, W)
        d = depth[0][CROP]
        assert np.isfinite(d).all() and (d > 0).mean() > 0.5
        med = np.median(d[d > 0])
        assert abs(med - GT_DEPTH) / GT_DEPTH < 0.2

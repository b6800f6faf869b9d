"""Geometric-exactness gate for the synthetic KITTI fabricator.

The round-5 soak / self-golden stack (tools_dev/soak_kitti_experiment,
tools_dev/self_golden_experiment) trains the PRODUCTION config on
data/synth.py mounts and asserts the model learns; that only means
anything if the fabricated stereo pair, intrinsics, stereo_T convention
(+-0.1 nominal baseline, `mono_dataset.py:237-243` in the reference)
and the exact depth hints are all mutually consistent THROUGH the
training warp. This test locks that contract: warping the stereo frame
with depth = hint * s must have its photometric minimum at s = 1.0
(same probe as tools_dev/warp_scale_probe.py, which diagnosed that the
round-5 far-default mount starved background supervision while the
geometry itself was exact).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from wavelet_monodepth_tpu.data.kitti import (KittiRawDataset,
                                              batch_iterator, readlines)
from wavelet_monodepth_tpu.data.splits import resolve_split_dir
from wavelet_monodepth_tpu.data.synth import fabricate
from wavelet_monodepth_tpu.ops.geometry import backproject_depth, project_3d
from wavelet_monodepth_tpu.ops.image import grid_sample_border
from wavelet_monodepth_tpu.train.losses_kitti import (
    compute_reprojection_loss)

H, W = 96, 320


@pytest.fixture(scope="module")
def mount(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_geo"))
    fabricate(root, n_train=4, n_val=2, n_test=2, progress=False,
              write_hints=True, hint_size=(H, W),
              z_range=(2.0, 12.0), bg_depth=14.0)
    return root


def _hint_warp_loss(batch, scale):
    depth = batch[("depth_hint",)] * scale
    mask = batch[("depth_hint_mask",)]
    cam = backproject_depth(depth, batch[("inv_K", 0)])
    pix = project_3d(cam, batch[("K", 0)], batch[("stereo_T",)], H, W)
    warped = grid_sample_border(batch[("color", "s", 0)], pix)
    loss = compute_reprojection_loss(warped, batch[("color", "0", 0)])
    return float((loss * mask).sum() / mask.sum())


def test_photometric_minimum_at_exact_hints(mount):
    split_dir = resolve_split_dir("eigen", mount)
    files = readlines(os.path.join(split_dir, "train_files.txt"))[:4]
    ds = KittiRawDataset(mount, files, H, W, frame_idxs=(0, "s"),
                         is_train=False, use_depth_hints=True)
    batch = next(batch_iterator(ds, 4, shuffle=False, drop_last=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    at_truth = _hint_warp_loss(batch, 1.0)
    ladder = {s: _hint_warp_loss(batch, s)
              for s in (0.7, 0.85, 0.95, 1.05, 1.2, 1.5)}
    # truth strictly beats every probe point, with real margin at +-5%
    assert all(at_truth < v for v in ladder.values()), (at_truth, ladder)
    assert at_truth < 0.8 * min(ladder[0.95], ladder[1.05]), (
        at_truth, ladder)


def test_mono_cues_present():
    # held-out monocular eval is only learnable if appearance encodes
    # depth: the fabricator's atmospheric attenuation must pull far
    # surfaces toward the sky color (round-5 finding; without cues,
    # held-out abs_rel plateaus ~0.55 while train-frame disparity
    # correlates 0.82 with the exact hints — pure memorization)
    from wavelet_monodepth_tpu.data.synth import SKY, render_scene
    rng = np.random.RandomState(3)
    left, _, depth, _ = render_scene(rng, z_range=(2.0, 12.0),
                                     bg_depth=14.0)
    dist = np.abs(left.astype(np.float32) - SKY[None, None]).mean(-1)
    near = dist[depth < 4.0].mean()
    far = dist[depth > 12.0].mean()
    assert near > 1.8 * far, (near, far)


def test_hints_are_nominal_baseline_units(mount):
    # hints are metric depth / 5.4 (the loader's 0.1 nominal baseline vs
    # the rendered rig's TRUE 0.54 m — data/synth.py:139-144), so the
    # near mount's z range [2, 14] m must land in [2/5.4, 14/5.4]
    split_dir = resolve_split_dir("eigen", mount)
    line = readlines(os.path.join(split_dir, "train_files.txt"))[0]
    folder, frame, _ = line.split()
    p = os.path.join(mount, "depth_hints", folder, "image_02",
                     f"{int(frame):010d}.npy")
    hint = np.load(p)
    nz = hint[hint > 0]
    assert nz.size
    assert 2.0 / 5.4 - 1e-3 <= nz.min() and nz.max() <= 14.0 / 5.4 + 1e-3

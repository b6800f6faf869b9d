"""Native C++ runtime (libwmd_native.so) vs the Python/JAX references."""

import os
import subprocess

import numpy as np
import pytest
from PIL import Image

from wavelet_monodepth_tpu.data import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available() and
    subprocess.call(["sh", os.path.join(os.path.dirname(__file__), "..",
                                        "native", "build.sh")]) != 0,
    reason="native library unavailable and unbuildable")


def test_decode_resize_batch(tmp_path):
    rng = np.random.RandomState(0)
    paths = []
    for i in range(3):
        arr = rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    out = native_loader.decode_resize_batch(paths, 48, 64,
                                            flips=[False, True, False])
    assert out.shape == (3, 48, 64, 3)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    # flipped image must differ from unflipped decode of the same file
    unflipped = native_loader.decode_resize_batch([paths[1]], 48, 64)
    np.testing.assert_allclose(out[1], unflipped[0, :, ::-1], atol=1e-6)


def test_decode_missing_file_raises(tmp_path):
    with pytest.raises(IOError):
        native_loader.decode_resize_batch([str(tmp_path / "nope.png")],
                                          32, 32)


def test_haar_roundtrip_matches_jax():
    import jax.numpy as jnp
    from wavelet_monodepth_tpu.ops import wavelets

    rng = np.random.RandomState(1)
    x = rng.randn(16, 24).astype(np.float32)
    ll, lh, hl, hh = native_loader.haar_dwt2(x)
    jll, jlh, jhl, jhh = wavelets.haar_dwt(
        jnp.asarray(x)[None, ..., None])
    np.testing.assert_allclose(ll, np.asarray(jll)[0, ..., 0], atol=1e-5)
    np.testing.assert_allclose(hh, np.asarray(jhh)[0, ..., 0], atol=1e-5)
    rec = native_loader.haar_idwt2(ll, lh, hl, hh)
    np.testing.assert_allclose(rec, x, atol=1e-5)


def test_velodyne_to_depth_matches_numpy():
    from wavelet_monodepth_tpu.data.kitti_utils import generate_depth_map
    # synthetic projection: identity rect, simple pinhole
    P = np.array([[100, 0, 160, 0],
                  [0, 100, 48, 0],
                  [0, 0, 1, 0]], dtype=np.float64)
    # velo->cam for this test: x forward -> z depth
    R = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0],
                  [0, 0, 0, 1.0]])
    P_velo2im = P @ R
    rng = np.random.RandomState(2)
    pts = np.zeros((50, 4), np.float32)
    pts[:, 0] = rng.rand(50) * 20 + 1      # forward
    pts[:, 1] = rng.randn(50) * 2          # left
    pts[:, 2] = rng.randn(50) * 0.5        # up
    pts[:, 3] = 1
    depth = native_loader.velodyne_to_depth(pts, P_velo2im, (96, 320))
    assert depth.shape == (96, 320)
    assert (depth > 0).sum() > 0
    assert depth.max() <= 21.5


def test_build_pyramid_shapes_and_values():
    """wmd_build_pyramid: chained half-scale resizes; level sizes halve
    and each level approximates a direct cv2 resize of the previous."""
    import cv2
    rng = np.random.RandomState(6)
    img = rng.rand(64, 96, 3).astype(np.float32)
    levels = native_loader.build_pyramid(img, 3)
    assert [a.shape for a in levels] == [(32, 48, 3), (16, 24, 3),
                                         (8, 12, 3)]
    want = cv2.resize(img, (48, 32), interpolation=cv2.INTER_LANCZOS4)
    np.testing.assert_allclose(levels[0], want, atol=1e-5)


def test_decode_resize_batch_u8_matches_float(tmp_path):
    """The uint8 decode is the same resized pixels the float variant
    converts: f32 == u8 * (1/255) to 1 ulp (convertTo runs after the
    uint8 resize in wmd_native.cpp)."""
    rng = np.random.RandomState(2)
    paths = []
    for i in range(2):
        arr = rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    u8 = native_loader.decode_resize_batch_u8(paths, 48, 64,
                                              flips=[False, True])
    f32 = native_loader.decode_resize_batch(paths, 48, 64,
                                            flips=[False, True])
    assert u8.dtype == np.uint8
    np.testing.assert_allclose(u8.astype(np.float32) / 255.0, f32,
                               atol=1e-7)


def _numpy_velo_scatter(pts, P_velo2im, im_shape):
    """The exact numpy projection from kitti_utils.generate_depth_map
    (post-calib part), as the cross-check oracle."""
    velo = pts[pts[:, 0] >= 0]
    pts_im = (P_velo2im @ np.concatenate(
        [velo[:, :3], np.ones((len(velo), 1), velo.dtype)], 1).T).T
    pts_im = pts_im.astype(np.float64)
    pts_im[:, :2] /= pts_im[:, 2:3]
    pts_im[:, 0] = np.round(pts_im[:, 0]) - 1
    pts_im[:, 1] = np.round(pts_im[:, 1]) - 1
    valid = ((pts_im[:, 0] >= 0) & (pts_im[:, 1] >= 0)
             & (pts_im[:, 0] < im_shape[1]) & (pts_im[:, 1] < im_shape[0])
             & np.isfinite(pts_im[:, 0]) & np.isfinite(pts_im[:, 1]))
    pts_im = pts_im[valid]
    depth = np.zeros(im_shape, np.float64)
    order = np.argsort(-pts_im[:, 2])
    depth[pts_im[order, 1].astype(np.int64),
          pts_im[order, 0].astype(np.int64)] = pts_im[order, 2]
    depth[depth < 0] = 0
    return depth.astype(np.float32)


def test_velodyne_to_depth_exact_cross_check():
    """Pixel-exact C++/numpy agreement, including the landmines: a
    pixel hit by BOTH a negative-z and a positive-z point must come out
    0 (min resolution then depth<0 -> 0, like the reference), and
    .5-exact projections must round half-even like np.round."""
    P = np.array([[100, 0, 160, 0],
                  [0, 100, 48, 0],
                  [0, 0, 1, 0]], dtype=np.float64)
    rng = np.random.RandomState(7)
    pts = np.zeros((200, 4), np.float32)
    # velo frame == cam frame here (identity R): z IS depth
    pts[:, 2] = rng.rand(200) * 20 + 1
    pts[:, 0] = rng.randn(200) * 2
    pts[:, 1] = rng.randn(200) * 0.5
    pts[:, 3] = 1
    # half-even rounding probes: u/z lands exactly on .5
    pts[0] = (0.165 * 10, 0.0, 10.0, 1.0)   # u = 100*1.65+1600 = 1765?
    pts[0, 0] = (164.5 - 160) / 100 * 10    # u/z = 164.5
    pts[1, 0] = (165.5 - 160) / 100 * 5
    pts[1, 2] = 5.0
    pts[1, 3] = 1.0
    # negative-z + positive-z duplicate pixel: center of the image
    pts[2] = (0.0, 0.0, 8.0, 1.0)           # center, depth 8
    pts[3] = (0.0, 0.0, -3.0, 1.0)          # same pixel, z = -3
    got = native_loader.velodyne_to_depth(pts, P, (96, 320))
    want = _numpy_velo_scatter(pts, P, (96, 320))
    np.testing.assert_array_equal(got, want)
    # the duplicate pixel really was contested and zeroed
    assert want[48 - 1, 160 - 1] == 0.0

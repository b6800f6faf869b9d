"""Op-level parity vs torch CPU primitives (padding, conv, pooling, SSIM,
grid_sample, geometry). These pin the exact conventions the reference
relies on — reflection padding, align_corners=False sampling, border
clamping — without importing any reference code."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from wavelet_monodepth_tpu.ops import convops, geometry, image, ssim  # noqa: E402


def _rand(shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("mode,tmode", [("reflect", "reflect"),
                                        ("replicate", "replicate"),
                                        ("zero", "constant")])
def test_pad2d(mode, tmode):
    x = _rand((2, 5, 7, 3))
    ours = np.asarray(image.pad2d(jnp.asarray(x), 1, mode))
    theirs = _to_nhwc(F.pad(_nchw(x), (1, 1, 1, 1), mode=tmode))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("pad_mode", ["reflect", "zero", "replicate"])
def test_conv3x3(pad_mode):
    x = _rand((1, 8, 10, 4), 1)
    w = _rand((3, 3, 4, 6), 2)       # HWIO
    b = _rand((6,), 3)
    ours = np.asarray(convops.conv3x3(jnp.asarray(x), jnp.asarray(w),
                                      jnp.asarray(b), pad_mode))
    tw = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))  # OIHW
    tmode = {"reflect": "reflect", "zero": "constant",
             "replicate": "replicate"}[pad_mode]
    tx = F.pad(_nchw(x), (1, 1, 1, 1), mode=tmode)
    theirs = _to_nhwc(F.conv2d(tx, tw, torch.from_numpy(b)))
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_conv1x1():
    x = _rand((2, 4, 5, 3), 4)
    w = _rand((1, 1, 3, 8), 5)
    b = _rand((8,), 6)
    ours = np.asarray(convops.conv1x1(jnp.asarray(x), jnp.asarray(w),
                                      jnp.asarray(b)))
    tw = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))
    theirs = _to_nhwc(F.conv2d(_nchw(x), tw, torch.from_numpy(b)))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_upsample_nearest2x():
    x = _rand((2, 3, 4, 5), 7)
    ours = np.asarray(image.upsample_nearest2x(jnp.asarray(x)))
    theirs = _to_nhwc(F.interpolate(_nchw(x), scale_factor=2,
                                    mode="nearest"))
    np.testing.assert_allclose(ours, theirs)


@pytest.mark.parametrize("k", [3, 5, 7])
def test_maxpool_same(k):
    x = (np.random.RandomState(8).rand(1, 6, 9, 1) > 0.7).astype(np.float32)
    ours = np.asarray(image.max_pool_same(jnp.asarray(x), k))
    theirs = _to_nhwc(F.max_pool2d(_nchw(x), k, stride=1, padding=k // 2))
    np.testing.assert_allclose(ours, theirs)


def test_bilinear_resize():
    x = _rand((2, 6, 8, 3), 9)
    ours = np.asarray(image.resize_bilinear(jnp.asarray(x), 12, 16))
    theirs = _to_nhwc(F.interpolate(_nchw(x), (12, 16), mode="bilinear",
                                    align_corners=False))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_ssim():
    a = np.random.RandomState(10).rand(2, 8, 9, 3).astype(np.float32)
    b = np.random.RandomState(11).rand(2, 8, 9, 3).astype(np.float32)
    ours = np.asarray(ssim.ssim(jnp.asarray(a), jnp.asarray(b)))

    # torch twin of KITTI/layers.py:281-311
    ta, tb = _nchw(a), _nchw(b)
    ta = F.pad(ta, (1, 1, 1, 1), mode="reflect")
    tb = F.pad(tb, (1, 1, 1, 1), mode="reflect")
    mu_x = F.avg_pool2d(ta, 3, 1)
    mu_y = F.avg_pool2d(tb, 3, 1)
    sx = F.avg_pool2d(ta ** 2, 3, 1) - mu_x ** 2
    sy = F.avg_pool2d(tb ** 2, 3, 1) - mu_y ** 2
    sxy = F.avg_pool2d(ta * tb, 3, 1) - mu_x * mu_y
    n = (2 * mu_x * mu_y + 0.01 ** 2) * (2 * sxy + 0.03 ** 2)
    d = (mu_x ** 2 + mu_y ** 2 + 0.01 ** 2) * (sx + sy + 0.03 ** 2)
    theirs = _to_nhwc(torch.clamp((1 - n / d) / 2, 0, 1))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_grid_sample_border():
    img = _rand((2, 7, 9, 3), 12)
    grid = (np.random.RandomState(13).rand(2, 5, 6, 2).astype(np.float32)
            * 2.4 - 1.2)  # include out-of-range coords
    ours = np.asarray(image.grid_sample_border(jnp.asarray(img),
                                               jnp.asarray(grid)))
    theirs = _to_nhwc(F.grid_sample(_nchw(img), torch.from_numpy(grid),
                                    padding_mode="border",
                                    align_corners=False))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_rot_from_axisangle_properties():
    vec = jnp.asarray(_rand((4, 1, 3), 14) * 0.3)
    R = geometry.rot_from_axisangle(vec)
    R3 = np.asarray(R)[:, :3, :3]
    eye = np.einsum("bij,bkj->bik", R3, R3)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (4, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R3), np.ones(4), atol=1e-5)
    # zero rotation -> identity
    R0 = geometry.rot_from_axisangle(jnp.zeros((1, 1, 3)))
    np.testing.assert_allclose(np.asarray(R0)[0], np.eye(4), atol=1e-6)


def test_transformation_invert_consistency():
    aa = jnp.asarray(_rand((2, 1, 3), 15) * 0.2)
    t = jnp.asarray(_rand((2, 1, 3), 16))
    Tf = geometry.transformation_from_parameters(aa, t, invert=False)
    Ti = geometry.transformation_from_parameters(aa, t, invert=True)
    prod = np.einsum("bij,bjk->bik", np.asarray(Tf), np.asarray(Ti))
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (2, 1, 1)),
                               atol=1e-5)


def test_backproject_project_roundtrip():
    h, w = 6, 8
    depth = jnp.asarray(np.random.RandomState(17).rand(1, h, w, 1)
                        .astype(np.float32) + 0.5)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * w, 1.92 * h
    K[0, 2], K[1, 2] = 0.5 * w, 0.5 * h
    K = jnp.asarray(K[None])
    inv_K = jnp.linalg.inv(K)
    pts = geometry.backproject_depth(depth, inv_K)
    grid = geometry.project_3d(pts, K, jnp.eye(4)[None], h, w)
    # identity transform must land every pixel on itself
    gx = np.asarray(grid)[0, ..., 0]
    gy = np.asarray(grid)[0, ..., 1]
    ex = (np.arange(w) / (w - 1) - 0.5) * 2
    ey = (np.arange(h) / (h - 1) - 0.5) * 2
    np.testing.assert_allclose(gx, np.tile(ex, (h, 1)), atol=1e-4)
    np.testing.assert_allclose(gy, np.tile(ey[:, None], (1, w)), atol=1e-4)


def test_disp_depth_roundtrip():
    disp = jnp.asarray(np.random.RandomState(18).rand(1, 4, 4, 1)
                       .astype(np.float32))
    scaled, depth = geometry.disp_to_depth(disp, 0.1, 100.0)
    back = geometry.depth_to_disp(depth, 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(disp), atol=1e-3)


def test_smooth_loss_torch_parity():
    disp = _rand((2, 6, 7, 1), 19)
    img = np.random.RandomState(20).rand(2, 6, 7, 3).astype(np.float32)
    ours = float(image.get_smooth_loss(jnp.asarray(disp), jnp.asarray(img)))
    td, ti = _nchw(disp), _nchw(img)
    gdx = torch.abs(td[:, :, :, :-1] - td[:, :, :, 1:])
    gdy = torch.abs(td[:, :, :-1, :] - td[:, :, 1:, :])
    gix = torch.mean(torch.abs(ti[:, :, :, :-1] - ti[:, :, :, 1:]), 1, True)
    giy = torch.mean(torch.abs(ti[:, :, :-1, :] - ti[:, :, 1:, :]), 1, True)
    theirs = float((gdx * torch.exp(-2 * gix)).mean()
                   + (gdy * torch.exp(-2 * giy)).mean())
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_get_grad_map():
    img = _rand((1, 6, 7, 3), 21)
    ours = np.asarray(image.get_grad_map(jnp.asarray(img)))
    assert ours.shape == (1, 6, 7, 6)
    red = np.asarray(image.get_grad_map(jnp.asarray(img), reduce=True))
    assert red.shape == (1, 6, 7, 2)
    ti = _nchw(img)
    gx = F.pad(torch.abs(ti[:, :, :, :-1] - ti[:, :, :, 1:]),
               (0, 1, 0, 0), mode="reflect")
    gy = F.pad(torch.abs(ti[:, :, :-1, :] - ti[:, :, 1:, :]),
               (0, 0, 0, 1), mode="reflect")
    theirs = _to_nhwc(torch.cat([gx, gy], dim=1))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)

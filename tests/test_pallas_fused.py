"""Fused wave-stage kernel vs the masked-dense oracle (interpret mode).

Exactness contract: interior pixels match the oracle bit-for-bit
(including across tile seams — halos carry true neighbor values); a
<=2-pixel ring at the IMAGE border may differ because the oracle
reflect-pads intermediate features while the kernel reflect-pads inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from wavelet_monodepth_tpu.ops import sparse as sp
from wavelet_monodepth_tpu.ops.image import upsample_nearest2x
from wavelet_monodepth_tpu.ops.pallas_fused import fused_wave_stage
from wavelet_monodepth_tpu.ops.wavelets import haar_idwt


def _oracle_stage(x, skip, yl, mask, params, i_scale):
    (w0, b0, w1, b1, wp1, bp1, wp3, bp3, wn1, bn1, wn3, bn3) = params
    masks = sp.stage_masks(mask)
    x0 = sp.masked_conv3x3(x, w0, b0, masks["lowres"], masks["upconv0"],
                           "reflect", jax.nn.elu)
    u = jnp.concatenate([upsample_nearest2x(x0), skip], axis=-1)
    u = u * masks["upsample"]
    x1 = sp.masked_conv3x3(u, w1, b1, None, masks["upconv1"], "reflect",
                           jax.nn.elu)
    pos = sp.masked_waveconv(x1, wp1, bp1, wp3, bp3, masks["upconv1"],
                             masks["wavelet"])
    neg = sp.masked_waveconv(x1, wn1, bn1, wn3, bn3, masks["upconv1"],
                             masks["wavelet"])
    yh = (2.0 ** (i_scale - 1)) * (pos - neg)
    yl_new = haar_idwt(yl, yh[..., 0:1], yh[..., 1:2], yh[..., 2:3])
    return yh, yl_new, x1


def _setup(n=1, hl=16, wl=128, cx=16, cs=8, cd=16, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, hl, wl, cx), jnp.float32)
    skip = jnp.asarray(rng.randn(n, 2 * hl, 2 * wl, cs), jnp.float32)
    yl = jnp.asarray(rng.randn(n, 2 * hl, 2 * wl, 1), jnp.float32)
    params = (
        jnp.asarray(rng.randn(3, 3, cx, cd) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(cd) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(3, 3, cd + cs, cd) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(cd) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(1, 1, cd, cd) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(cd) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(3, 3, cd, 3) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(3) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(1, 1, cd, cd) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(cd) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(3, 3, cd, 3) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(3) * 0.1, jnp.float32),
    )
    return x, skip, yl, params


def _run_both(mask, i_scale=2, seed=0, **kw):
    x, skip, yl, params = _setup(seed=seed, **kw)
    (w0, b0, w1, b1, wp1, bp1, wp3, bp3, wn1, bn1, wn3, bn3) = params
    ref = _oracle_stage(x, skip, yl, mask, params, i_scale)
    ours = fused_wave_stage(
        x, skip, yl, mask, w0, b0, w1, b1,
        wp1, bp1, wp3, bp3, wn1, bn1, wn3, bn3,
        i_scale=i_scale, interpret=True)
    return ref, ours


def _interior(a, border):
    return np.asarray(a)[:, border:-border, border:-border]


def test_fused_stage_matches_oracle_interior():
    rng = np.random.RandomState(1)
    mask = jnp.asarray((rng.rand(1, 16, 128, 1) > 0.8).astype(np.float32))
    (yh_r, yl_r, x1_r), (yh_o, yl_o, x1_o) = _run_both(mask)
    np.testing.assert_allclose(_interior(yh_o, 2), _interior(yh_r, 2),
                               atol=1e-5)
    np.testing.assert_allclose(_interior(x1_o, 2), _interior(x1_r, 2),
                               atol=1e-5)
    np.testing.assert_allclose(_interior(yl_o, 4), _interior(yl_r, 4),
                               atol=1e-5)


def test_fused_stage_tile_seams_exact():
    """Interior tile seams (rows 16, cols 128 of the high grid with
    (16,128) tiles on a 32x256 image) must be exact: halos carry true
    neighbors, not tile-local padding."""
    rng = np.random.RandomState(2)
    mask = jnp.ones((1, 16, 128, 1), jnp.float32)
    (yh_r, yl_r, x1_r), (yh_o, yl_o, x1_o) = _run_both(mask, seed=3)
    # full-tensor comparison away from the image border only
    np.testing.assert_allclose(_interior(yh_o, 3), _interior(yh_r, 3),
                               atol=1e-5)
    seam = np.abs(np.asarray(yh_o) - np.asarray(yh_r))[:, 14:18, 3:-3]
    assert seam.max() < 1e-5, "tile seam mismatch"


def test_fused_stage_inactive_tiles_idwt_only():
    mask = jnp.zeros((1, 16, 128, 1), jnp.float32)
    (yh_r, yl_r, x1_r), (yh_o, yl_o, x1_o) = _run_both(mask, seed=4)
    np.testing.assert_allclose(np.asarray(yh_o),
                               np.zeros_like(np.asarray(yh_o)))
    np.testing.assert_allclose(np.asarray(yl_o), np.asarray(yl_r),
                               atol=1e-5)


def test_fused_stage_batched():
    rng = np.random.RandomState(5)
    mask = jnp.asarray((rng.rand(2, 16, 128, 1) > 0.7).astype(np.float32))
    (yh_r, yl_r, x1_r), (yh_o, yl_o, x1_o) = _run_both(mask, seed=6, n=2)
    np.testing.assert_allclose(_interior(yh_o, 2), _interior(yh_r, 2),
                               atol=1e-5)

"""Tile-sparse Pallas conv vs the masked-dense oracle (interpret mode on
CPU; compiled path exercised by bench.py on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelet_monodepth_tpu.ops import sparse as sp
from wavelet_monodepth_tpu.ops.pallas_conv import (conv3x3_tile_sparse,
                                                   tile_flags)


def _data(h=16, w=256, cin=16, cout=8, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(h, w, cin), jnp.float32)
    wgt = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
    return x, wgt, b


def test_tile_flags():
    mask = jnp.zeros((16, 256, 1)).at[3, 10, 0].set(1.0)
    flags = tile_flags(mask, 8, 128)
    assert flags.shape == (4,)
    np.testing.assert_array_equal(np.asarray(flags), [1, 0, 0, 0])


@pytest.mark.parametrize("pad_mode", ["reflect", "zero"])
def test_matches_masked_dense_full_mask(pad_mode):
    x, w, b = _data()
    mask = jnp.ones((16, 256, 1), jnp.float32)
    ours = conv3x3_tile_sparse(x, w, b, mask, pad_mode,
                               nonlin=jax.nn.elu, interpret=True)
    ref = sp.masked_conv3x3(x[None], w, b, None, mask[None], pad_mode,
                            jax.nn.elu)[0]
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=1e-5)


def test_matches_masked_dense_partial_mask():
    x, w, b = _data(h=24, w=256, cin=8, cout=8, seed=1)
    rng = np.random.RandomState(2)
    mask = jnp.asarray((rng.rand(24, 256, 1) > 0.8).astype(np.float32))
    ours = conv3x3_tile_sparse(x, w, b, mask, "reflect",
                               nonlin=jax.nn.sigmoid, interpret=True)
    ref = sp.masked_conv3x3(x[None], w, b, None, mask[None], "reflect",
                            jax.nn.sigmoid)[0]
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=1e-5)


def test_inactive_tiles_write_zero():
    x, w, b = _data(h=32, w=256, cin=8, cout=4, seed=3)
    mask = jnp.zeros((32, 256, 1)).at[2:4, 5:40, :].set(1.0)
    out = conv3x3_tile_sparse(x, w, b, mask, "reflect", interpret=True)
    out_np = np.asarray(out)
    # everything outside the active tile rows must be exactly zero
    assert np.all(out_np[8:] == 0.0)
    assert np.all(out_np[:8, 128:] == 0.0)
    assert np.abs(out_np[2:4, 5:40]).max() > 0


def test_non_tile_multiple_shapes():
    """H, W not multiples of the tile: padding + slice-back must hide it."""
    x, w, b = _data(h=20, w=200, cin=8, cout=8, seed=4)
    mask = jnp.ones((20, 200, 1), jnp.float32)
    ours = conv3x3_tile_sparse(x, w, b, mask, "reflect", interpret=True)
    ref = sp.masked_conv3x3(x[None], w, b, None, mask[None], "reflect",
                            None)[0]
    assert ours.shape == (20, 200, 8)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=1e-5)


def test_decoder_sparse_pallas_matches_oracle():
    """Full sparse decoder with use_pallas routing (interpreter on CPU)
    must match the masked-dense oracle."""
    from wavelet_monodepth_tpu.models.decoders_kitti import \
        KittiWaveletDecoder
    from wavelet_monodepth_tpu.models.resnet import ResnetEncoder, \
        num_ch_enc

    H, W = 64, 96
    enc = ResnetEncoder(num_layers=18)
    x = jnp.asarray(np.random.RandomState(0).rand(1, H, W, 3), jnp.float32)
    ev = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(ev, x)
    dec = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))
    dv = dec.init(jax.random.PRNGKey(1), feats)
    oracle = dec.apply(dv, feats, thresh_ratio=0.05)
    pallas = dec.apply(dv, feats, thresh_ratio=0.05, use_pallas=True)
    for s in range(4):
        np.testing.assert_allclose(
            np.asarray(oracle[("disp", s)]),
            np.asarray(pallas[("disp", s)]), atol=1e-5,
            err_msg=f"disp {s}")


def test_2d_tile_sparse_matches_oracle():
    from wavelet_monodepth_tpu.ops.pallas_conv import conv3x3_tile_sparse_2d
    x, w, b = _data(h=24, w=200, cin=8, cout=8, seed=7)
    rng = np.random.RandomState(8)
    mask = jnp.asarray((rng.rand(24, 200, 1) > 0.7).astype(np.float32))
    ours = conv3x3_tile_sparse_2d(x, w, b, mask, "reflect",
                                  nonlin=jax.nn.sigmoid, th=8, tw=64,
                                  interpret=True)
    ref = sp.masked_conv3x3(x[None], w, b, None, mask[None], "reflect",
                            jax.nn.sigmoid)[0]
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=1e-5)


def test_2d_tile_sparse_batched():
    from wavelet_monodepth_tpu.ops.pallas_conv import conv3x3_tile_sparse_2d
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(2, 16, 128, 8), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 8, 4) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(4) * 0.1, jnp.float32)
    mask = jnp.asarray((rng.rand(2, 16, 128, 1) > 0.5).astype(np.float32))
    ours = conv3x3_tile_sparse_2d(x, w, b, mask, "zero", th=8, tw=64,
                                  interpret=True)
    ref = sp.masked_conv3x3(x, w, b, None, mask, "zero", None)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=1e-5)

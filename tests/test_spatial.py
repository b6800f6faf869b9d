"""Spatial (image-height) sharding over the mesh 'spatial' axis.

Large-image batch-1 inference is the shape data parallelism can't
split; here the image is sharded into horizontal bands and GSPMD
inserts the conv halo exchanges. These tests pin the only thing that
matters: the sharded forward is numerically identical to single-device
execution, for both the dense decoder and the sparse path (whose
global threshold max/min reduces ACROSS bands).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelet_monodepth_tpu.models.decoders_kitti import KittiWaveletDecoder
from wavelet_monodepth_tpu.models.resnet import ResnetEncoder, num_ch_enc
from wavelet_monodepth_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def small_model():
    H, W = 64, 96
    enc = ResnetEncoder(num_layers=18)
    dec = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, H, W, 3),
                           jnp.float32)
    ev = enc.init(rng, x)
    dv = dec.init(rng, enc.apply(ev, x))
    return enc, dec, ev, dv, x


def test_spatial_sharded_dense_matches_single_device(small_model):
    enc, dec, ev, dv, x = small_model
    m = mesh_lib.make_mesh(data=1, spatial=8)

    def forward(ev, dv, image):
        out = dec.apply(dv, enc.apply(ev, image))
        return out[("disp", 0)], out[("wavelets", 1, "LH")]

    ref = forward(ev, dv, x)
    jf = mesh_lib.jit_spatial_forward(m, forward)
    got = jf(mesh_lib.replicate(m, ev), mesh_lib.replicate(m, dv),
             mesh_lib.shard_spatial(m, x))
    # the input really is banded over 8 devices
    xs = mesh_lib.shard_spatial(m, x)
    assert len({s.device for s in xs.addressable_shards}) == 8
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   atol=1e-5, rtol=0)


def test_spatial_sharded_sparse_matches_single_device(small_model):
    """The sparse path's threshold is (max-min) over the WHOLE image
    (`depth_decoder.py:308`) — under banding that reduction must cross
    devices. Masks and disp must still match exactly."""
    enc, dec, ev, dv, x = small_model
    m = mesh_lib.make_mesh(data=1, spatial=8)

    def forward(ev, dv, image):
        out = dec.apply(dv, enc.apply(ev, image), thresh_ratio=0.05)
        return (out[("disp", 0)], out[("wavelet_mask", 1)],
                out[("total_ops", -1)])

    ref = forward(ev, dv, x)
    jf = mesh_lib.jit_spatial_forward(m, forward)
    got = jf(mesh_lib.replicate(m, ev), mesh_lib.replicate(m, dv),
             mesh_lib.shard_spatial(m, x))
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(got[0]),
                               atol=1e-5, rtol=0)
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
    np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(got[2]))


def test_spatial_times_data_mesh(small_model):
    """2x4 (data x spatial) mesh: batch over 'data', height over
    'spatial', both at once."""
    enc, dec, ev, dv, x = small_model
    x2 = jnp.concatenate([x, x[:, :, ::-1]], axis=0)
    m = mesh_lib.make_mesh(data=2, spatial=4)

    def forward(ev, dv, image):
        return dec.apply(dv, enc.apply(ev, image))[("disp", 0)]

    ref = forward(ev, dv, x2)
    rep = mesh_lib.replicated(m)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(m, P("data", "spatial"))
    jf = jax.jit(forward, in_shardings=(rep, rep, sh),
                 out_shardings=rep)
    got = jf(mesh_lib.replicate(m, ev), mesh_lib.replicate(m, dv),
             jax.device_put(x2, sh))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               atol=1e-5, rtol=0)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelet_monodepth_tpu.models.decoders_nyu import (NyuDecoder,
                                                       NyuDecoder224,
                                                       NyuDecoderWave,
                                                       NyuDecoderWave224)

H, W = 64, 96
NUM_CH_ENC = (24, 24, 48, 96, 128)   # small stand-in pyramid for speed


@pytest.fixture(scope="module")
def feats():
    rng = np.random.RandomState(0)
    return [jnp.asarray(rng.rand(1, H // f, W // f, c), jnp.float32)
            for f, c in zip((2, 4, 8, 16, 32), NUM_CH_ENC)]


def test_baseline(feats):
    dec = NyuDecoder(num_ch_enc=NUM_CH_ENC)
    v = dec.init(jax.random.PRNGKey(0), feats)
    out = dec.apply(v, feats)
    assert out[("disp", 0)].shape == (1, H // 2, W // 2, 1)


def test_baseline224(feats):
    dec = NyuDecoder224(num_ch_enc=NUM_CH_ENC)
    v = dec.init(jax.random.PRNGKey(0), feats)
    out = dec.apply(v, feats)
    assert out[("disp", 0)].shape == (1, H, W, 1)


def test_wave_dense(feats):
    dec = NyuDecoderWave(num_ch_enc=NUM_CH_ENC)
    v = dec.init(jax.random.PRNGKey(1), feats)
    out = dec.apply(v, feats)
    assert out[("disp", 3)].shape == (1, H // 16, W // 16, 1)
    assert out[("disp", 0)].shape == (1, H // 2, W // 2, 1)
    assert ("wavelets", 2, "LL") in out
    assert ("wavelets", 0, "HH") in out
    # IDWT consistency: disp2 must be the IDWT of (LL2, H2) / 4
    from wavelet_monodepth_tpu.ops.wavelets import haar_idwt
    rec = haar_idwt(out[("wavelets", 2, "LL")], out[("wavelets", 2, "LH")],
                    out[("wavelets", 2, "HL")], out[("wavelets", 2, "HH")])
    np.testing.assert_allclose(np.asarray(rec / 4),
                               np.asarray(out[("disp", 2)]), atol=1e-6)


def test_wave_sparse_equals_dense_at_minus1(feats):
    dec = NyuDecoderWave(num_ch_enc=NUM_CH_ENC)
    v = dec.init(jax.random.PRNGKey(1), feats)
    dense = dec.apply(v, feats)
    sparse = dec.apply(v, feats, thresh_ratio=-1.0)
    for s in range(4):
        np.testing.assert_allclose(np.asarray(dense[("disp", s)]),
                                   np.asarray(sparse[("disp", s)]),
                                   atol=1e-5, err_msg=f"disp {s}")
    assert float(np.sum(sparse[("total_ops", -1)])) > 0


def test_wave_sparse_thresholded(feats):
    dec = NyuDecoderWave(num_ch_enc=NUM_CH_ENC)
    v = dec.init(jax.random.PRNGKey(1), feats)
    out = dec.apply(v, feats, thresh_ratio=0.1)
    full = dec.apply(v, feats, thresh_ratio=-1.0)
    assert float(np.sum(out[("total_ops", -1)])) <= \
        float(np.sum(full[("total_ops", -1)]))
    # masks live at the coefficient resolutions: scale 1 at H/8, scale 0
    # at H/4 (upsample of the previous coefficients' grid)
    assert out[("wavelet_mask", 1)].shape == (1, H // 8, W // 8, 1)
    assert out[("wavelet_mask", 0)].shape == (1, H // 4, W // 4, 1)


def test_wave224(feats):
    dec = NyuDecoderWave224(num_ch_enc=NUM_CH_ENC)
    v = dec.init(jax.random.PRNGKey(2), feats)
    out = dec.apply(v, feats)
    assert out[("disp", 0)].shape == (1, H, W, 1)
    assert ("wavelets", 3, "LL") in out


def test_depthwise_variants(feats):
    dec = NyuDecoderWave(num_ch_enc=NUM_CH_ENC, dw_waveconv=True,
                         dw_upconv=True)
    v = dec.init(jax.random.PRNGKey(3), feats)
    out = dec.apply(v, feats)
    assert out[("disp", 0)].shape == (1, H // 2, W // 2, 1)


def test_upblock_polyphase_matches_original(feats):
    """NYU UpBlocks use the polyphase upsample+conv folding on the dense
    path; outputs must match the materialized composition."""
    from wavelet_monodepth_tpu.models.decoders_nyu import UpBlock
    x = feats[-1]
    skip = feats[-2]
    blk = UpBlock(32, "zero", use_polyphase=True)
    v = blk.init(jax.random.PRNGKey(3), x, skip)
    got = blk.apply(v, x, skip)                   # polyphase (post-init)
    # original composition: materialize upsample+concat, call the conv
    from wavelet_monodepth_tpu.ops.convops import conv3x3
    from wavelet_monodepth_tpu.ops.image import upsample_nearest2x
    p = v["params"]["convA"]
    up = jnp.concatenate([upsample_nearest2x(x), skip], axis=-1)
    want = jax.nn.leaky_relu(conv3x3(up, p["kernel"], p["bias"], "zero"),
                             negative_slope=0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=0)


def test_decoder_polyphase_matches_original(feats):
    """Decoder-level use_polyphase (round-3 review: the UpBlock flag was
    unreachable) — dense AND masked-sparse outputs must match the
    original composition up to fp reassociation, for the wave decoder
    and the 224 variant."""
    for cls in (NyuDecoderWave, NyuDecoderWave224, NyuDecoder):
        dec0 = cls(num_ch_enc=NUM_CH_ENC)
        dec1 = cls(num_ch_enc=NUM_CH_ENC, use_polyphase=True)
        v = dec0.init(jax.random.PRNGKey(3), feats)
        out0 = dec0.apply(v, feats)
        out1 = dec1.apply(v, feats)
        np.testing.assert_allclose(
            np.asarray(out1[("disp", 0)]), np.asarray(out0[("disp", 0)]),
            atol=2e-5, err_msg=f"{cls.__name__} dense")
    dec0 = NyuDecoderWave(num_ch_enc=NUM_CH_ENC)
    dec1 = NyuDecoderWave(num_ch_enc=NUM_CH_ENC, use_polyphase=True)
    v = dec0.init(jax.random.PRNGKey(3), feats)
    s0 = dec0.apply(v, feats, thresh_ratio=0.05)
    s1 = dec1.apply(v, feats, thresh_ratio=0.05)
    for s in range(4):
        np.testing.assert_allclose(
            np.asarray(s1[("disp", s)]), np.asarray(s0[("disp", s)]),
            atol=2e-5, err_msg=f"sparse disp {s}")

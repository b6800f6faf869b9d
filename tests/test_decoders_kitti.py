import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelet_monodepth_tpu.models.decoders_kitti import (DepthDecoder,
                                                         KittiWaveletDecoder)
from wavelet_monodepth_tpu.models.resnet import ResnetEncoder, num_ch_enc
from wavelet_monodepth_tpu.ops.sparse import compute_density

H, W = 64, 96


@pytest.fixture(scope="module")
def enc_feats():
    enc = ResnetEncoder(num_layers=18)
    x = jnp.asarray(np.random.RandomState(0).rand(1, H, W, 3), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)
    return feats


def test_encoder_pyramid(enc_feats):
    shapes = [f.shape for f in enc_feats]
    assert shapes == [(1, H // 2, W // 2, 64), (1, H // 4, W // 4, 64),
                      (1, H // 8, W // 8, 128), (1, H // 16, W // 16, 256),
                      (1, H // 32, W // 32, 512)]


def test_baseline_decoder(enc_feats):
    dec = DepthDecoder(num_ch_enc=num_ch_enc(18))
    variables = dec.init(jax.random.PRNGKey(1), enc_feats)
    out = dec.apply(variables, enc_feats)
    for s in range(4):
        d = out[("disp", s)]
        assert d.shape == (1, H // 2 ** s, W // 2 ** s, 1)
        assert float(d.min()) >= 0 and float(d.max()) <= 1


@pytest.fixture(scope="module")
def wave_setup(enc_feats):
    dec = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))
    variables = dec.init(jax.random.PRNGKey(2), enc_feats)
    return dec, variables


def test_wavelet_dense(enc_feats, wave_setup):
    dec, variables = wave_setup
    out = dec.apply(variables, enc_feats)
    for s in range(4):
        d = out[("disp", s)]
        assert d.shape == (1, H // 2 ** s, W // 2 ** s, 1)
        assert float(d.min()) >= 0 and float(d.max()) <= 1
        for c in ("LL", "LH", "HL", "HH"):
            assert ("wavelets", s, c) in out
    # coefficient scale conventions: LL at scale 3 bounded by 2^4
    ll3 = out[("wavelets", 3, "LL")]
    assert float(jnp.max(ll3)) <= 2.0 ** 4
    assert ll3.shape == (1, H // 16, W // 16, 1)


def test_sparse_equals_dense_at_threshold_minus1(enc_feats, wave_setup):
    """The notebook oracle (KITTI sparsity notebook cell 13): at
    thresh_ratio=-1 every mask is all-ones and the sparse decoder must
    reproduce the dense decoder. atol 1e-5 (not bit-equal) because the
    dense path fuses the pos+neg heads into one block-diagonal conv —
    identical math, different float accumulation order."""
    dec, variables = wave_setup
    dense = dec.apply(variables, enc_feats)
    sparse = dec.apply(variables, enc_feats, thresh_ratio=-1.0)
    for s in range(4):
        np.testing.assert_allclose(
            np.asarray(dense[("disp", s)]), np.asarray(sparse[("disp", s)]),
            atol=1e-5, err_msg=f"disp scale {s}")
        for c in ("LH", "HL", "HH"):
            np.testing.assert_allclose(
                np.asarray(dense[("wavelets", s, c)]),
                np.asarray(sparse[("wavelets", s, c)]), atol=1e-5)
        assert float(sparse[("wavelet_mask", s)].mean()) == 1.0


def test_sparse_thresholded(enc_feats, wave_setup):
    dec, variables = wave_setup
    out = dec.apply(variables, enc_feats, thresh_ratio=0.05)
    dens = float(compute_density(out))
    assert 0.0 <= dens <= 1.0
    assert float(np.sum(out[("total_ops", -1)])) > 0
    # thresholded run must cost fewer counted ops than the all-on run
    out_full = dec.apply(variables, enc_feats, thresh_ratio=-1.0)
    assert float(np.sum(out[("total_ops", -1)])) <= \
        float(np.sum(out_full[("total_ops", -1)]))
    # masks only exist for sparse mode and with the right resolutions
    for s in range(4):
        m = out[("wavelet_mask", s)]
        assert m.shape == (1, H // 2 ** (s + 1), W // 2 ** (s + 1), 1)


def test_sparse_disp_close_to_dense_at_loose_threshold(enc_feats, wave_setup):
    """Small thresholds only drop small coefficients -> disp error bounded."""
    dec, variables = wave_setup
    dense = dec.apply(variables, enc_feats)
    sparse = dec.apply(variables, enc_feats, thresh_ratio=0.02)
    d0 = np.asarray(dense[("disp", 0)])
    s0 = np.asarray(sparse[("disp", 0)])
    assert np.abs(d0 - s0).mean() < 0.05


def test_jit_dense_and_sparse(enc_feats, wave_setup):
    dec, variables = wave_setup
    f_dense = jax.jit(lambda v, f: dec.apply(v, f))
    f_sparse = jax.jit(lambda v, f: dec.apply(v, f, thresh_ratio=0.05))
    o1 = f_dense(variables, list(enc_feats))
    o2 = f_sparse(variables, list(enc_feats))
    assert o1[("disp", 0)].shape == o2[("disp", 0)].shape


def test_batched_sparse_matches_per_image(enc_feats, wave_setup):
    """Per-image thresholds: a batch-2 sparse decode must equal decoding
    each image alone (the reference only supports batch 1; this is the
    batched generalization)."""
    dec, variables = wave_setup
    enc = ResnetEncoder(num_layers=18)
    x = jnp.asarray(np.random.RandomState(9).rand(2, H, W, 3), jnp.float32)
    ev = enc.init(jax.random.PRNGKey(0), x)
    feats2 = enc.apply(ev, x)
    batched = dec.apply(variables, feats2, thresh_ratio=0.05)
    for n in range(2):
        single = dec.apply(variables, [f[n:n + 1] for f in feats2],
                           thresh_ratio=0.05)
        np.testing.assert_allclose(
            np.asarray(batched[("disp", 0)][n]),
            np.asarray(single[("disp", 0)][0]), atol=1e-5)


def test_sparse_scales_subset_dense_fallback(enc_feats, wave_setup):
    """With sparse_scales=(3,) scales 2 and 1 take the dense-fallback
    branch (dense convs, yh masked) — reference depth_decoder.py:384-426.
    At thresh=-1 every branch must still reproduce dense."""
    dec, variables = wave_setup
    dense = dec.apply(variables, enc_feats)
    sparse = dec.apply(variables, enc_feats, thresh_ratio=-1.0,
                       sparse_scales=(3,))
    for s in range(4):
        np.testing.assert_allclose(
            np.asarray(dense[("disp", s)]), np.asarray(sparse[("disp", s)]),
            atol=1e-6, err_msg=f"disp {s}")
    # thresholded run through the fallback branch stays close to dense
    sp2 = dec.apply(variables, enc_feats, thresh_ratio=0.02,
                    sparse_scales=(3,))
    assert np.abs(np.asarray(dense[("disp", 0)])
                  - np.asarray(sp2[("disp", 0)])).mean() < 0.05


def test_polyphase_matches_original_composition(enc_feats):
    """use_polyphase folds upsample+upconv_X_1 into per-phase 2x2
    kernels (ops/convops.py). Dense and masked-sparse outputs must match
    the original composition to fp-reassociation noise, and the
    thresh=-1 sparse==dense golden identity must stay BIT-exact."""
    on = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18),
                             use_polyphase=True)
    off = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18),
                              use_polyphase=False)
    dv = on.init(jax.random.PRNGKey(1), enc_feats)
    a, b = on.apply(dv, enc_feats), off.apply(dv, enc_feats)
    for s in range(4):
        np.testing.assert_allclose(a[("disp", s)], b[("disp", s)],
                                   atol=5e-5, rtol=0)
    sp_on = on.apply(dv, enc_feats, thresh_ratio=-1.0)
    np.testing.assert_array_equal(np.asarray(sp_on[("disp", 0)]),
                                  np.asarray(a[("disp", 0)]))
    s_on = on.apply(dv, enc_feats, thresh_ratio=0.05)
    s_off = off.apply(dv, enc_feats, thresh_ratio=0.05)
    for s in range(4):
        np.testing.assert_allclose(s_on[("disp", s)], s_off[("disp", s)],
                                   atol=5e-5, rtol=0)
    np.testing.assert_allclose(s_on[("total_ops", -1)],
                               s_off[("total_ops", -1)], rtol=1e-6)


def test_upsample_mask_is_2x2_constant():
    """The identity the masked polyphase path rests on:
    dilate5(upsample(m)) == upsample(dilate3(m)) including borders."""
    from wavelet_monodepth_tpu.ops.image import upsample_nearest2x
    from wavelet_monodepth_tpu.ops.sparse import dilate_mask, stage_masks
    for seed in range(3):
        m = jnp.asarray(
            (np.random.RandomState(seed).rand(2, 9, 13, 1) > 0.8),
            jnp.float32)
        got = stage_masks(m)["upsample"]
        want = upsample_nearest2x(dilate_mask(m, 3))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sparse_no_skips(enc_feats):
    """Regression: the sparse path dereferenced skip.shape for
    use_skips=False (round-3 review). Golden identity must hold
    skip-less too, and the whole-stage backends that structurally
    require skips must refuse loudly."""
    dec = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18), use_skips=False)
    v = dec.init(jax.random.PRNGKey(2), enc_feats)
    dense = dec.apply(v, enc_feats)
    sparse = dec.apply(v, enc_feats, thresh_ratio=-1.0)
    np.testing.assert_array_equal(np.asarray(sparse[("disp", 0)]),
                                  np.asarray(dense[("disp", 0)]))
    out = dec.apply(v, enc_feats, thresh_ratio=0.05)
    assert out[("disp", 0)].shape == dense[("disp", 0)].shape
    with pytest.raises(ValueError, match="use_skips"):
        dec.apply(v, enc_feats, thresh_ratio=0.05, use_pallas="sites")

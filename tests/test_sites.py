"""Site-compacted sparse engine (ops/sites.py): bit-equal to the
masked-dense oracle through the WHOLE decoder (borders included), plus
primitive round-trips, capacity semantics, and the edge-mask generator
(utils/maskgen.py) the bench uses."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelet_monodepth_tpu.models.decoders_kitti import KittiWaveletDecoder
from wavelet_monodepth_tpu.models.resnet import ResnetEncoder, num_ch_enc
from wavelet_monodepth_tpu.ops import sites as st
from wavelet_monodepth_tpu.utils import maskgen as mg


@pytest.fixture(scope="module")
def model():
    rng = jax.random.PRNGKey(0)
    enc = ResnetEncoder(num_layers=18)
    dec = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))
    x = jax.random.uniform(rng, (2, 64, 160, 3), jnp.float32)
    ev = enc.init(rng, x)
    feats = enc.apply(ev, x)
    dv = dec.init(rng, feats)
    return dec, dv, feats


def test_sites_bit_equal_full_decoder(model):
    dec, dv, feats = model
    ref = dec.apply(dv, feats, thresh_ratio=0.05)
    got = dec.apply(dv, feats, thresh_ratio=0.05, use_pallas="sites",
                    compact_cap=1.0)
    for s in (0, 1, 2, 3):
        np.testing.assert_allclose(got[("disp", s)], ref[("disp", s)],
                                   atol=5e-6, rtol=0,
                                   err_msg=f"disp {s}")
    for s in (0, 1, 2):
        for band in ("LH", "HL", "HH"):
            np.testing.assert_allclose(got[("wavelets", s, band)],
                                       ref[("wavelets", s, band)],
                                       atol=5e-6, rtol=0)
    np.testing.assert_allclose(got[("total_ops", -1)],
                               ref[("total_ops", -1)], rtol=1e-6)


def test_sites_dense_threshold_golden(model):
    """thresh -1 => all-ones masks; sites at full capacity == dense."""
    dec, dv, feats = model
    dense = dec.apply(dv, feats)
    got = dec.apply(dv, feats, thresh_ratio=-1.0, use_pallas="sites",
                    compact_cap=1.0)
    np.testing.assert_allclose(got[("disp", 0)], dense[("disp", 0)],
                               atol=5e-6, rtol=0)


def test_decoder_surfaces_overflow_counts(model):
    """Compacted backends report dropped capacity in ("overflow", s):
    zero at full capacity (exact run), positive when the cap is starved
    — silent divergence from the oracle is observable (ADVICE r2)."""
    dec, dv, feats = model
    full = dec.apply(dv, feats, thresh_ratio=0.05, use_pallas="sites",
                     compact_cap=1.0)
    for s in (0, 1, 2):
        assert int(full[("overflow", s)]) == 0
    starved = dec.apply(dv, feats, thresh_ratio=-1.0, use_pallas="sites",
                        compact_cap=0.01)
    assert sum(int(starved[("overflow", s)]) for s in (0, 1, 2)) > 0
    cap_full = dec.apply(dv, feats, thresh_ratio=0.05,
                         use_pallas="capacity", compact_cap=1.0)
    for s in (0, 1, 2):
        assert int(cap_full[("overflow", s)]) == 0
    cmp_starved = dec.apply(dv, feats, thresh_ratio=-1.0,
                            use_pallas="compact", compact_cap=0.05)
    assert sum(int(cmp_starved[("overflow", s)]) for s in (0, 1, 2)) > 0


def test_site_list_and_overflow():
    rng = jax.random.PRNGKey(1)
    m = (jax.random.uniform(rng, (2, 8, 16, 1)) > 0.7).astype(jnp.float32)
    n_act = int(m.sum())
    idx = np.asarray(st.site_list(m, n_act + 4))
    flat = np.asarray(m).reshape(-1)
    assert (np.sort(idx[:n_act]) == np.nonzero(flat)[0]).all()
    assert (idx[n_act:] == flat.size).all()          # sentinel padding
    assert int(st.site_overflow(m, n_act)) == 0
    assert int(st.site_overflow(m, n_act - 3)) == 3


def test_gather_scatter_roundtrip():
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (2, 12, 20, 5))
    m = jnp.ones((2, 12, 20, 1))
    sites = st.site_list(m, 2 * 12 * 20)
    from wavelet_monodepth_tpu.ops.image import pad2d
    patches = st.gather_patches(pad2d(x, 1, "zero"), sites, 12, 20)
    centre = patches[:, 4 * 5:5 * 5]                 # (dy=0, dx=0) slot
    out = st.scatter_rows(centre, sites, 2, 12, 20)
    np.testing.assert_allclose(out, x, atol=0)


def test_maskgen_density_and_structure():
    disp = mg.synthetic_depth_scene(4, 96, 320, seed=3)
    assert disp.shape == (4, 96, 320, 1)
    assert 0.0 <= disp.min() and disp.max() <= 1.0
    masks, ratio, dens = mg.masks_at_density(disp, 0.10)
    assert abs(dens - 0.10) < 0.01
    # edge structure: active fraction of rows >> density (thin curves)
    m1 = np.asarray(masks[1])[..., 0]
    rows_active = (m1.max(axis=2) > 0).mean()
    assert rows_active > 3 * m1.mean()

"""Whole-stage tile compaction (ops/compact.py) vs the masked-dense
oracle. The tile engine recomputes halos from reflect-padded INPUTS, so
a <=2 px high-res ring at the IMAGE border may deviate per stage (same
contract as ops/pallas_fused.py); interior pixels are exact. Decoder
chaining compounds the ring across scales, so strict equality is tested
per-stage here; the bit-exact whole-decoder backend is 'sites'
(tests/test_sites.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelet_monodepth_tpu.models.decoders_kitti import KittiWaveletDecoder
from wavelet_monodepth_tpu.models.resnet import ResnetEncoder, num_ch_enc
from wavelet_monodepth_tpu.ops import compact as cp
from wavelet_monodepth_tpu.ops import sparse as sp
from wavelet_monodepth_tpu.ops.sparse import compute_density


def _stage_params(key, cx, cs, cd):
    ks = jax.random.split(key, 12)
    return (jax.random.normal(ks[0], (3, 3, cx, cd)) * 0.05,
            jax.random.normal(ks[1], (cd,)) * 0.1,
            jax.random.normal(ks[2], (3, 3, cd + cs, cd)) * 0.05,
            jax.random.normal(ks[3], (cd,)) * 0.1,
            jax.random.normal(ks[4], (1, 1, cd, cd)) * 0.1,
            jax.random.normal(ks[5], (cd,)) * 0.1,
            jax.random.normal(ks[6], (3, 3, cd, 3)) * 0.1,
            jax.random.normal(ks[7], (3,)) * 0.1,
            jax.random.normal(ks[8], (1, 1, cd, cd)) * 0.1,
            jax.random.normal(ks[9], (cd,)) * 0.1,
            jax.random.normal(ks[10], (3, 3, cd, 3)) * 0.1,
            jax.random.normal(ks[11], (3,)) * 0.1)


def _oracle_stage(x, skip, mask, prm, i_scale):
    (w0, b0, w1, b1, wp1, bp1, wp3, bp3, wn1, bn1, wn3, bn3) = prm
    m = sp.stage_masks(mask)
    x0 = sp.masked_conv3x3(x, w0, b0, m["lowres"], m["upconv0"],
                           "reflect", jax.nn.elu)
    u = sp.masked_upsample_concat(x0, skip, m["upsample"])
    x1 = sp.masked_conv3x3(u, w1, b1, None, m["upconv1"], "reflect",
                           jax.nn.elu)
    pos = sp.masked_waveconv(x1, wp1, bp1, wp3, bp3, m["upconv1"],
                             m["wavelet"])
    neg = sp.masked_waveconv(x1, wn1, bn1, wn3, bn3, m["upconv1"],
                             m["wavelet"])
    return (2.0 ** (i_scale - 1)) * (pos - neg), x1


@pytest.fixture(scope="module")
def stage_case():
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 4)
    n, hl, wl, cx, cs, cd = 2, 16, 40, 64, 64, 32
    x = jax.random.normal(ks[0], (n, hl, wl, cx)) * 0.5
    skip = jax.random.normal(ks[1], (n, 2 * hl, 2 * wl, cs)) * 0.5
    yl = jax.random.normal(ks[2], (n, 2 * hl, 2 * wl, 1))
    yh = jax.random.normal(ks[3], (n, hl, wl, 3)) * 0.3
    mask = sp.wavelet_threshold_mask(yl, yh, 0.12)
    assert 0.01 < float(mask.mean()) < 0.6
    prm = _stage_params(jax.random.PRNGKey(7), cx, cs, cd)
    yh_ref, x1_ref = _oracle_stage(x, skip, mask, prm, i_scale=1)
    return x, skip, mask, prm, yh_ref, x1_ref


@pytest.mark.parametrize("th,tw", [(8, 16), (8, 32), (16, 16)])
def test_stage_matches_oracle_interior(stage_case, th, tw):
    x, skip, mask, prm, yh_ref, x1_ref = stage_case
    yh, x1 = cp.compact_wave_stage(x, skip, mask, *prm, i_scale=1,
                                   th=th, tw=tw, cap_ratio=1.0)
    np.testing.assert_allclose(yh[:, 2:-2, 2:-2], yh_ref[:, 2:-2, 2:-2],
                               atol=2e-5, rtol=0)
    np.testing.assert_allclose(x1[:, 2:-2, 2:-2], x1_ref[:, 2:-2, 2:-2],
                               atol=2e-5, rtol=0)
    # the border ring deviation is bounded
    assert float(jnp.abs(yh - yh_ref).max()) < 0.5


def test_stage_capacity_margin_exact(stage_case):
    """A capacity just above the true active-tile count is still exact."""
    x, skip, mask, prm, yh_ref, _ = stage_case
    th, tw = 8, 16
    act = float((np.asarray(cp.tile_scores(
        sp.stage_masks(mask)["upconv1"], th, tw)) > 0).mean())
    yh, _ = cp.compact_wave_stage(x, skip, mask, *prm, i_scale=1, th=th,
                                  tw=tw, cap_ratio=min(1.0, act + 0.05))
    np.testing.assert_allclose(yh[:, 2:-2, 2:-2], yh_ref[:, 2:-2, 2:-2],
                               atol=2e-5, rtol=0)


def test_overflow_drops_gracefully(stage_case):
    x, skip, mask, prm, _, _ = stage_case
    yh, x1 = cp.compact_wave_stage(x, skip, mask, *prm, i_scale=1,
                                   th=8, tw=16, cap_ratio=0.03)
    assert bool(jnp.all(jnp.isfinite(yh)))
    assert bool(jnp.all(jnp.isfinite(x1)))


def test_decoder_integration_finite_and_masked():
    rng = jax.random.PRNGKey(0)
    enc = ResnetEncoder(num_layers=18)
    dec = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))
    x = jax.random.uniform(rng, (2, 64, 160, 3), jnp.float32)
    ev = enc.init(rng, x)
    feats = enc.apply(ev, x)
    dv = dec.init(rng, feats)
    got = dec.apply(dv, feats, thresh_ratio=0.05, use_pallas="compact",
                    compact_cap=1.0)
    ref = dec.apply(dv, feats, thresh_ratio=0.05)
    for s in (0, 1, 2, 3):
        assert bool(jnp.all(jnp.isfinite(got[("disp", s)])))
    # masks are mask-path outputs, independent of backend at scale 3
    np.testing.assert_allclose(got[("wavelet_mask", 2)],
                               ref[("wavelet_mask", 2)], atol=0)
    assert float(compute_density(got)) > 0


def test_stage_primitives():
    rng = jax.random.PRNGKey(1)
    m = (jax.random.uniform(rng, (2, 16, 32, 1)) > 0.8).astype(jnp.float32)
    scores = cp.tile_scores(m, 8, 8)
    assert scores.shape == (2 * 2 * 4,)
    assert float(scores.sum()) == float(m.sum())
    act = int((np.asarray(scores).reshape(2, -1) > 0).sum())
    assert int(cp.stage_overflow(m, 8, 8, act)) == 0
    assert int(cp.stage_overflow(m, 8, 8, max(act - 2, 0))) > 0


def test_pretile_scatter_roundtrip():
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (2, 20, 24, 3))
    tiles = cp._pretile(x, 8, 8, 3, 3, 0)
    idx = jnp.arange(2 * 9)
    out = cp._scatter(tiles, idx, 2, 3, 3, 8, 8, 20, 24)
    np.testing.assert_allclose(out, x, atol=0)

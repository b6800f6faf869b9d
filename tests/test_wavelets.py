import jax.numpy as jnp
import numpy as np

from wavelet_monodepth_tpu.ops import wavelets


def test_idwt_closed_form():
    """IDWT must match the 2x2 butterfly the reference spells out in
    my_iwt_once (depth_decoder.py:225-239)."""
    rng = np.random.RandomState(0)
    ll, lh, hl, hh = [jnp.asarray(rng.randn(2, 3, 5, 1), jnp.float32)
                      for _ in range(4)]
    out = wavelets.haar_idwt(ll, lh, hl, hh)
    assert out.shape == (2, 6, 10, 1)
    # spot-check the four phases of the first 2x2 block
    l, a, b, c = [np.asarray(t)[0, 0, 0, 0] for t in (ll, lh, hl, hh)]
    o = np.asarray(out)[0]
    np.testing.assert_allclose(o[0, 0, 0], (l + a + b + c) / 2, rtol=1e-6)
    np.testing.assert_allclose(o[0, 1, 0], (l + a - b - c) / 2, rtol=1e-6)
    np.testing.assert_allclose(o[1, 0, 0], (l - a + b - c) / 2, rtol=1e-6)
    np.testing.assert_allclose(o[1, 1, 0], (l - a - b + c) / 2, rtol=1e-6)


def test_dwt_idwt_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 12, 3), jnp.float32)
    ll, lh, hl, hh = wavelets.haar_dwt(x)
    rec = wavelets.haar_idwt(ll, lh, hl, hh)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-5)


def test_idwt_dwt_roundtrip():
    rng = np.random.RandomState(2)
    bands = [jnp.asarray(rng.randn(1, 4, 6, 2), jnp.float32)
             for _ in range(4)]
    rec = wavelets.haar_idwt(*bands)
    back = wavelets.haar_dwt(rec)
    for a, b in zip(bands, back):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_orthonormal_energy():
    """Orthonormal transform preserves L2 energy."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 16, 16, 1), jnp.float32)
    ll, lh, hl, hh = wavelets.haar_dwt(x)
    e_in = float(jnp.sum(x ** 2))
    e_out = float(sum(jnp.sum(t ** 2) for t in (ll, lh, hl, hh)))
    np.testing.assert_allclose(e_in, e_out, rtol=1e-5)


def test_dwt_J_shapes():
    x = jnp.zeros((2, 32, 48, 1))
    yl, highs = wavelets.haar_dwt_J(x, 4)
    assert yl.shape == (2, 2, 3, 1)
    assert [h[0].shape for h in highs] == [
        (2, 16, 24, 1), (2, 8, 12, 1), (2, 4, 6, 1), (2, 2, 3, 1)]


def test_stacked_idwt():
    rng = np.random.RandomState(4)
    yl = jnp.asarray(rng.randn(1, 4, 4, 1), jnp.float32)
    yh = jnp.asarray(rng.randn(1, 4, 4, 1, 3), jnp.float32)
    a = wavelets.haar_idwt_stacked(yl, yh)
    b = wavelets.haar_idwt(yl, yh[..., 0], yh[..., 1], yh[..., 2])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

import jax.numpy as jnp
import numpy as np

from wavelet_monodepth_tpu.train import losses_nyu


def test_ssim_windowed_self_is_one():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 3),
                    jnp.float32)
    v = float(losses_nyu.ssim_windowed(x, x, val_range=1.0))
    np.testing.assert_allclose(v, 1.0, atol=1e-5)


def test_ssim_windowed_decreases_with_noise():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 16, 16, 1), jnp.float32)
    y = x + jnp.asarray(rng.randn(1, 16, 16, 1) * 0.3, jnp.float32)
    assert float(losses_nyu.ssim_windowed(x, y, 1.0)) < 0.9


def test_berhu_quadratic_beyond_c():
    pred = jnp.asarray([[0.0, 0.0]])
    target = jnp.asarray([[1.0, 10.0]])
    # c = 0.2*10 = 2 -> |1| < 2 linear, |10| quadratic
    v = float(losses_nyu.berhu_loss(pred, target))
    expected = (1.0 + (100 + 4) / 4.0) / 2
    np.testing.assert_allclose(v, expected, rtol=1e-5)


def test_cropped_l1_ignores_border():
    pred = jnp.zeros((1, 8, 8, 1))
    target = jnp.zeros((1, 8, 8, 1)).at[:, 0, 0, :].set(100.0)
    assert float(losses_nyu.cropped_l1_loss(pred, target)) == 0.0

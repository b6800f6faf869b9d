"""Auxiliary NYU losses — rebuild of `NYUv2/loss.py` (the training loop
actually uses plain L1, `NYUv2/train.py:255`; these are the alternative
losses the reference ships: windowed SSIM with a Gaussian kernel, Laina
BerHu, border-cropped L1). The reference's `SpatialGradientsLoss` is dead
code referencing undefined names (`loss.py:62-104`, SURVEY §2 #26) and is
not reproduced.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _gaussian_window(window_size: int, sigma: float = 1.5) -> jnp.ndarray:
    g = jnp.asarray([math.exp(-(x - window_size // 2) ** 2
                              / (2.0 * sigma ** 2))
                     for x in range(window_size)])
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim_windowed(img1: Array, img2: Array, val_range: float,
                  window_size: int = 11, size_average: bool = True,
                  full: bool = False):
    """Gaussian-window SSIM (`loss.py:22-59`): VALID padding, per-channel
    depthwise filtering, L = val_range. NHWC."""
    n, h, w, c = img1.shape
    real = min(window_size, h, w)
    win = _gaussian_window(real).reshape(real, real, 1, 1)
    win = jnp.tile(win, (1, 1, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, win, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu12
    C1 = (0.01 * val_range) ** 2
    C2 = (0.03 * val_range) ** 2
    v1 = 2.0 * s12 + C2
    v2 = s1 + s2 + C2
    cs = jnp.mean(v1 / v2)
    ssim_map = ((2 * mu12 + C1) * v1) / ((mu1_sq + mu2_sq + C1) * v2)
    ret = jnp.mean(ssim_map) if size_average else jnp.mean(
        ssim_map, axis=(1, 2, 3))
    return (ret, cs) if full else ret


def berhu_loss(pred: Array, target: Array) -> Array:
    """Laina et al. reverse-Huber (`loss.py:107-124`)."""
    diff = jnp.abs(pred - target)
    c = 0.2 * jnp.max(diff)
    loss = jnp.where(diff < c, diff,
                     (diff ** 2 + c ** 2) / (2 * c + 1e-9))
    return jnp.mean(loss)


def cropped_l1_loss(pred: Array, target: Array,
                    crop_border: int = 2) -> Array:
    """L1 with a zeroed border (`loss.py:126-138`). NHWC."""
    diff = jnp.abs(pred - target)
    mask = jnp.zeros_like(target)
    mask = mask.at[:, crop_border:target.shape[1] - crop_border,
                   crop_border:target.shape[2] - crop_border, :].set(1.0)
    return jnp.mean(diff * mask)

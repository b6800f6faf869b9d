"""Functional convolution primitives, NHWC / HWIO, on top of
`lax.conv_general_dilated` (XLA tiles these onto the MXU).

These are the compute cores shared by the flax modules in `models/` and by
the masked-sparse engine in `ops/sparse.py`; equivalents of the reference's
Conv3x3 / Conv1x1 wrappers (`KITTI/layers.py:120-173`,
`NYUv2/networks/layers.py:11-32`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .image import pad2d

_DIMS = ("NHWC", "HWIO", "NHWC")


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
           stride: int = 1, padding="VALID",
           feature_group_count: int = 1) -> jnp.ndarray:
    """Plain NHWC conv. w: (kh, kw, cin/groups, cout)."""
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=_DIMS, feature_group_count=feature_group_count,
        preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    return y


def conv3x3(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
            pad_mode: str = "reflect", stride: int = 1) -> jnp.ndarray:
    """3x3 conv with explicit pad-then-VALID, matching the reference's
    pad+conv composition exactly (incl. reflect/replicate modes that
    SAME-padding convs can't express)."""
    return conv2d(pad2d(x, 1, pad_mode), w, b, stride=stride)


def conv1x1(x: jnp.ndarray, w: jnp.ndarray,
            b: jnp.ndarray | None = None) -> jnp.ndarray:
    return conv2d(x, w, b)


def elu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.elu(x)


def leaky_relu(x: jnp.ndarray, slope: float) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope=slope)

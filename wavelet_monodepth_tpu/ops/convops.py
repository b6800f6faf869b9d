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


def _poly_collapse(w: jnp.ndarray) -> jnp.ndarray:
    """Collapse a (3, 3, Ci, Co) kernel over a nearest-x2-upsampled input
    into per-phase (2, 2) kernels -> (2, 2, Ci, 4*Co), phase order
    (r, s) = (0,0), (0,1), (1,0), (1,1) along the output channels.

    Over u = upsample_nearest2x(x0), output phase r in {0,1} (row parity)
    reads low-res rows {i-1, i} (r=0) or {i, i+1} (r=1); kernel taps
    mapping to the same low-res pixel sum (u is 2x2-constant):
      r=0: [w0, w1+w2]   r=1: [w0+w1, w2]     (same along columns).
    """
    y0 = jnp.stack([w[0], w[1] + w[2]])            # (2, 3, Ci, Co)
    y1 = jnp.stack([w[0] + w[1], w[2]])
    phases = []
    for wy in (y0, y1):
        phases.append(jnp.stack([wy[:, 0], wy[:, 1] + wy[:, 2]], axis=1))
        phases.append(jnp.stack([wy[:, 0] + wy[:, 1], wy[:, 2]], axis=1))
    return jnp.concatenate(phases, axis=-1)        # (2, 2, Ci, 4Co)


def _poly_interleave(y: jnp.ndarray, co: int) -> jnp.ndarray:
    """(N, h+1, w+1, 4Co) phase-conv output -> (N, 2h, 2w, Co)."""
    n, hp1, wp1, _ = y.shape
    h, w = hp1 - 1, wp1 - 1
    p00 = y[:, :h, :w, :co]
    p01 = y[:, :h, 1:, co:2 * co]
    p10 = y[:, 1:, :w, 2 * co:3 * co]
    p11 = y[:, 1:, 1:, 3 * co:]
    top = jnp.stack([p00, p01], axis=3).reshape(n, h, 2 * w, co)
    bot = jnp.stack([p10, p11], axis=3).reshape(n, h, 2 * w, co)
    return jnp.stack([top, bot], axis=2).reshape(n, 2 * h, 2 * w, co)


def upconv1_polyphase(x0: jnp.ndarray, skip: jnp.ndarray, w: jnp.ndarray,
                      b: jnp.ndarray | None, pad_mode: str = "reflect",
                      nonlin=None) -> jnp.ndarray:
    """conv3x3(concat(upsample_nearest2x(x0), skip)) without materializing
    the upsample: the upsampled half of the input is 2x2-constant, so its
    3x3 taps collapse to per-phase 2x2 kernels evaluated at LOW res
    (4/9 of the MACs) — and the 4 phases stack on the output-channel
    axis, so the thin Co occupies 4x the MXU lanes
    (`depth_decoder.py:138-152`'s upconv X_1 composition; the decoder's
    hottest conv, PERF.md traced table).

    Exact up to fp reassociation of the collapsed taps (<= 1e-6 f32).
    Boundary map: reflect/replicate padding of the upsampled tensor both
    reduce to EDGE padding of x0 at low res (u[-1] = u[1] = x0[0] under
    reflect); zero stays zero.

    Args:
      x0: (N, h, w, Cd) pre-upsample features. skip: (N, 2h, 2w, Cs).
      w: (3, 3, Cd+Cs, Co) HWIO of the fused conv. b: (Co,) or None.
    """
    cd = x0.shape[-1]
    co = w.shape[-1]
    w_u, w_s = w[:, :, :cd], w[:, :, cd:]
    lo_pad = "zero" if pad_mode == "zero" else "replicate"
    yu = conv2d(pad2d(x0, 1, lo_pad), _poly_collapse(w_u))
    y = _poly_interleave(yu, co) + conv3x3(skip, w_s, None, pad_mode)
    if b is not None:
        y = y + b
    if nonlin is not None:
        y = nonlin(y)
    return y


def elu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.elu(x)


def leaky_relu(x: jnp.ndarray, slope: float) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope=slope)

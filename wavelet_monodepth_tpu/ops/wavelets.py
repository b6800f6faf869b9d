"""Single-level 2-D Haar DWT/IDWT, NHWC, pure JAX (reshape + butterfly).

The inverse transform implements the closed-form arithmetic the reference
spells out in `KITTI/networks/decoders/depth_decoder.py:225-239`
(`my_iwt_once`): with orthonormal Haar filters, each 2x2 output block is

    out[2i,   2j  ] = (ll + h0 + h1 + h2) / 2
    out[2i,   2j+1] = (ll + h0 - h1 - h2) / 2
    out[2i+1, 2j  ] = (ll - h0 + h1 - h2) / 2
    out[2i+1, 2j+1] = (ll - h0 - h1 + h2) / 2

where (h0, h1, h2) = (LH, HL, HH) in the pytorch_wavelets ordering used by
the reference (yh[:, :, 0/1/2] -> "LH"/"HL"/"HH",
`depth_decoder.py:159-162`).  The forward transform is its exact inverse
(the transform is orthonormal), used by the NYU training loop to derive GT
coefficients (`NYUv2/train.py:258,288-290`).

On TPU this lowers to a handful of VPU adds plus a reshape — XLA fuses the
butterfly into neighbouring elementwise work, so a dedicated Pallas kernel
is only used where the IDWT is fused with thresholding (see ops/sparse.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def haar_idwt(ll: jnp.ndarray, lh: jnp.ndarray, hl: jnp.ndarray,
              hh: jnp.ndarray) -> jnp.ndarray:
    """Inverse single-level orthonormal Haar transform.

    Args:
      ll, lh, hl, hh: (N, H, W, C) subband images.
    Returns:
      (N, 2H, 2W, C) reconstruction.
    """
    n, h, w, c = ll.shape
    a = (ll + lh + hl + hh) * 0.5   # (2i,   2j)
    b = (ll + lh - hl - hh) * 0.5   # (2i,   2j+1)
    d = (ll - lh + hl - hh) * 0.5   # (2i+1, 2j)
    e = (ll - lh - hl + hh) * 0.5   # (2i+1, 2j+1)
    # Interleave: rows from (a,b) / (d,e), cols from (a,d) / (b,e).
    top = jnp.stack([a, b], axis=3).reshape(n, h, 2 * w, c)
    bot = jnp.stack([d, e], axis=3).reshape(n, h, 2 * w, c)
    out = jnp.stack([top, bot], axis=2).reshape(n, 2 * h, 2 * w, c)
    return out


def haar_dwt(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                      jnp.ndarray]:
    """Forward single-level orthonormal Haar transform (exact inverse of
    `haar_idwt`).

    Args:
      x: (N, 2H, 2W, C). Height/width must be even.
    Returns:
      (ll, lh, hl, hh), each (N, H, W, C).
    """
    n, h2, w2, c = x.shape
    assert h2 % 2 == 0 and w2 % 2 == 0, "haar_dwt needs even H and W"
    h, w = h2 // 2, w2 // 2
    x = x.reshape(n, h, 2, w, 2, c)
    x00 = x[:, :, 0, :, 0, :]
    x01 = x[:, :, 0, :, 1, :]
    x10 = x[:, :, 1, :, 0, :]
    x11 = x[:, :, 1, :, 1, :]
    ll = (x00 + x01 + x10 + x11) * 0.5
    lh = (x00 + x01 - x10 - x11) * 0.5
    hl = (x00 - x01 + x10 - x11) * 0.5
    hh = (x00 - x01 - x10 + x11) * 0.5
    return ll, lh, hl, hh


def haar_dwt_J(x: jnp.ndarray, J: int):
    """J-level forward Haar DWT (pytorch_wavelets `DWT(J=J)` equivalent,
    reference `NYUv2/train.py:258`).

    Returns (yl, [level-1 (lh,hl,hh), level-2 ..., level-J ...]) where
    level-1 is the finest. If an intermediate LL has odd size it is
    edge-padded to even first (the reference uses mode="reflect"; for the
    sizes used in practice — powers of two times 30/40 — no padding occurs).
    """
    highs = []
    ll = x
    for _ in range(J):
        n, h, w, c = ll.shape
        if h % 2 or w % 2:
            ll = jnp.pad(ll, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)),
                         mode="edge")
        ll, lh, hl, hh = haar_dwt(ll)
        highs.append((lh, hl, hh))
    return ll, highs


def haar_idwt_stacked(yl: jnp.ndarray, yh: jnp.ndarray) -> jnp.ndarray:
    """IDWT with the three high bands stacked on a trailing axis.

    Args:
      yl: (N, H, W, C); yh: (N, H, W, C, 3) stacked (LH, HL, HH).
    """
    return haar_idwt(yl, yh[..., 0], yh[..., 1], yh[..., 2])

"""Site-compacted sparse engine: the reference's per-pixel
gather->GEMM->scatter formulation (`KITTI/layers.py:409-480`), rebuilt
on XLA primitives so compute scales with active-site count.

Round-2 finding (PERF.md): tile-granular skipping cannot reach the
paper's speedups on real masks — trained-model masks are thin depth-edge
curves, and a curve of length L touches ~L/tile-side tiles, so ~10%
pixel density still activates 40-70% of tiles at any usable tile shape.
Only pixel granularity converts coefficient sparsity to wall-clock.

Execution per conv:
  1. active output sites from the stage mask -> static-capacity site
     list (cumsum slot assignment + scatter; no sort/top_k),
  2. im2col rows for those sites gathered from the reflect-PADDED dense
     input map as 3 contiguous (3*C,) pixel-triples per site
     (vmap(dynamic_slice) -> one XLA gather of contiguous rows),
  3. one (K, 9C) x (9C, Cout) GEMM (M = sites: MXU-shaped),
  4. one row scatter back to a dense zeros map.

Exactness: BIT-equal to the masked-dense oracle (`ops/sparse.py`)
everywhere, image borders included — gathers read the reflect-padded
true dense intermediates exactly like the oracle's pad2d, and inactive
sites are zeros by construction (the scatter target is zeros, matching
`y * out_mask`). Unlike the reference's engine there is a static
capacity K per site set; overflowing sites are dropped (use
`site_overflow` to check; capacity 1.0 can never overflow).

Padding slots use an out-of-range sentinel: gathers clip (garbage rows,
computed but discarded), scatters drop (mode="drop"), so padded slots
are harmless and shapes stay static.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .image import pad2d, upsample_nearest2x
from .sparse import stage_masks

Array = jnp.ndarray


def site_list(mask: Array, kcap: int) -> Array:
    """Active-site flat ids of an (N, H, W, 1) {0,1} mask, raster order,
    zero-padded to static length kcap with the out-of-range sentinel
    N*H*W. Slot assignment is cumsum + scatter (O(M), no sort)."""
    m = mask.reshape(-1) > 0.5
    total = m.shape[0]
    slot = jnp.cumsum(m) - 1
    pos = jnp.where(m, slot, kcap)            # overflow rows -> dropped
    return jnp.full((kcap,), total, jnp.int32).at[pos].set(
        jnp.arange(total, dtype=jnp.int32), mode="drop")


def site_overflow(mask: Array, kcap: int) -> Array:
    """Number of active sites beyond capacity (0 = exact)."""
    return jnp.maximum(jnp.sum(mask > 0.5) - kcap, 0)


def stage_site_overflow(mask: Array, cap_lo: float, cap_hi: float,
                        cap_wav: float) -> Array:
    """Total dropped sites for one site_wave_stage call (0 = the stage
    is bit-equal to the oracle). Mirrors the three site_list capacities
    inside site_wave_stage exactly."""
    n, h_l, w_l = mask.shape[0], mask.shape[1], mask.shape[2]
    hh, wh = 2 * h_l, 2 * w_l
    masks = stage_masks(mask)
    return (site_overflow(masks["upconv0"], _cap(n * h_l * w_l, cap_lo))
            + site_overflow(masks["upconv1"], _cap(n * hh * wh, cap_hi))
            + site_overflow(masks["wavelet"], _cap(n * hh * wh, cap_wav)))


def gather_patches(xpad: Array, sites: Array, height: int,
                   width: int) -> Array:
    """im2col rows for 3x3 convs: (K, 9*C) patches around each site,
    read from the reflect-padded dense map.

    Args:
      xpad: (N, H+2, W+2, C) padded input (pad2d of the true map).
      sites: (K,) flat ids in (N, H, W) raster order (sentinel = N*H*W).
      height, width: unpadded spatial dims (static).
    Rows are (dy, dx, c) ordered, matching w.reshape(9*C, Cout).
    """
    n, hp, wp, c = xpad.shape
    b = sites // (height * width)
    rem = sites % (height * width)
    y, x = rem // width, rem % width
    base = (b * hp + y + 1) * wp + (x + 1)    # padded centre pixel id
    flat = xpad.reshape(-1)
    size = flat.shape[0]

    def triple(dy):
        start = jnp.clip((base + dy * wp - 1) * c, 0, size - 3 * c)
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(flat, (s,), (3 * c,)))(start)

    return jnp.concatenate([triple(-1), triple(0), triple(1)], axis=-1)


def scatter_rows(rows: Array, sites: Array, n: int, height: int,
                 width: int) -> Array:
    """(K, C) compacted rows -> dense (N, H, W, C) zeros map (sentinel
    and overflow slots drop)."""
    c = rows.shape[-1]
    out = jnp.zeros((n * height * width, c), rows.dtype)
    return out.at[sites].set(rows, mode="drop").reshape(
        n, height, width, c)


def _cap(n_px: int, ratio: float) -> int:
    return max(8, min(n_px, math.ceil(n_px * ratio)))


@functools.partial(jax.jit, static_argnames=("i_scale", "cap_lo",
                                             "cap_hi", "cap_wav"))
def site_wave_stage(x: Array, skip: Array, mask: Array,
                    w0: Array, b0: Array, w1: Array, b1: Array,
                    wp1: Array, bp1: Array, wp3: Array, bp3: Array,
                    wn1: Array, bn1: Array, wn3: Array, bn3: Array,
                    i_scale: int, cap_lo: float = 0.5,
                    cap_hi: float = 0.35, cap_wav: float = 0.25):
    """One sparse decoder scale, site-compacted.

    Args/returns match ops.compact.compact_wave_stage; unlike the tile
    engine this is bit-equal to the oracle at every pixel (borders
    included) whenever no site set overflows its capacity (cap_* are
    fractions of each mask's full pixel count; the defaults hold ~3x
    margin over the ~10%-density operating point's dilated masks).
    """
    n, h_l, w_l, cx = x.shape
    cs = skip.shape[-1]
    cd = w0.shape[-1]
    hh, wh = 2 * h_l, 2 * w_l
    masks = stage_masks(mask)

    # ---- upconv0 at lo-res upconv0-mask sites -------------------------
    xp = pad2d(x * masks["lowres"], 1, "reflect")
    s0 = site_list(masks["upconv0"], _cap(n * h_l * w_l, cap_lo))
    p0 = gather_patches(xp, s0, h_l, w_l)                 # (K0, 9Cx)
    r0 = jax.nn.elu(p0 @ w0.reshape(9 * cx, cd) + b0)
    x0 = scatter_rows(r0, s0, n, h_l, w_l)                # == x0 * m_u0

    # ---- upsample + concat as split-weight GEMMs at upconv1 sites -----
    u = upsample_nearest2x(x0) * masks["upsample"]
    sk = skip * masks["upsample"]
    s1 = site_list(masks["upconv1"], _cap(n * hh * wh, cap_hi))
    pu = gather_patches(pad2d(u, 1, "reflect"), s1, hh, wh)
    ps = gather_patches(pad2d(sk, 1, "reflect"), s1, hh, wh)
    w1r = w1.reshape(3, 3, cd + cs, cd)
    w1x = w1r[:, :, :cd, :].reshape(9 * cd, cd)   # (ky, kx, ci) raster
    w1s = w1r[:, :, cd:, :].reshape(9 * cs, cd)   # matches patch order
    r1 = jax.nn.elu(pu @ w1x + ps @ w1s + b1)             # (K1, Cd)
    x1 = scatter_rows(r1, s1, n, hh, wh)                  # == x1 * m_u1

    # ---- fused pos+neg heads ------------------------------------------
    # 1x1 squeeze compact at S1 (oracle re-masks by m_u1: rows ARE S1)
    w1h = jnp.concatenate([wp1.reshape(cd, cd), wn1.reshape(cd, cd)],
                          axis=-1)
    b1h = jnp.concatenate([bp1, bn1])
    hrows = r1 @ w1h + b1h
    hrows = jnp.where(hrows >= 0, hrows, 0.1 * hrows)     # (K1, 2Cd)
    h = scatter_rows(hrows, s1, n, hh, wh)
    # block-diagonal 3x3 (2Cd -> 6) at wavelet sites
    sw = site_list(masks["wavelet"], _cap(n * hh * wh, cap_wav))
    pw = gather_patches(pad2d(h, 1, "reflect"), sw, hh, wh)
    w3 = jnp.zeros((3, 3, 2 * cd, 6), x1.dtype)
    w3 = w3.at[:, :, :cd, :3].set(wp3)
    w3 = w3.at[:, :, cd:, 3:].set(wn3)
    b3 = jnp.concatenate([bp3, bn3])
    yw = jax.nn.sigmoid(pw @ w3.reshape(18 * cd, 6) + b3)
    yh_rows = (2.0 ** (i_scale - 1)) * (yw[:, :3] - yw[:, 3:])
    yh = scatter_rows(yh_rows, sw, n, hh, wh)             # == yh * m_wv
    return yh, x1

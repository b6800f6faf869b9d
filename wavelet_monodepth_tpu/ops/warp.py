"""Descriptor-free stereo warp: a Pallas row-band kernel replacing the
XLA gather in the reprojection warps.

The KITTI train step's hot spot is `F.grid_sample` reprojection
(`KITTI/trainer.py:371-374`): per-pixel bilinear gathers are
descriptor-rate-bound on TPU (~140 M rows/s; they were 47% of the b12
step even after 4->1 gather stacking, PERF.md "Training step"). For the
published stereo configs every warp grid is ROW-BANDED: rectified
stereo translation keeps y within +-0.51 px of the output row (the
monodepth2 /(dim-1) normalize + align_corners=False sample introduces
the deterministic +-0.5 row shift; x moves by disparity). That
structure turns the warp into, per output row,

  out[j] = (1-wy) * H(src[y0]) + wy * H(src[y0+1]),   y0 in {row-1, row}

where H is a 1-D horizontal bilinear resample. H is expressible as a
dense (W x W) two-banded interpolation matrix built IN VMEM from iota
comparisons (never touching HBM) and applied as one MXU dot per row —
zero gather descriptors. wy / y0 are per-row constants up to ~1e-6 fp
noise (the row value is read at column 0; torch's own per-pixel values
carry the same noise), so one row mix + one dot per row suffices.

Forward and backward (custom_vjp: src, wx, wy paths; the x/y pixel-coord
chain stays ordinary jax so clamping gradients match
padding_mode='border') each run 1-2 (C,W)x(W,W) dots per row. Rows are
processed channels-on-sublanes (C=3 images waste 5 of 8 sublanes
instead of 125 of 128 lanes).

Used by train/losses_kitti.py for "s"-frame and depth-hint warps (the
flagship stereo+hints config warps nothing else); pose-frame warps keep
the general gather path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _row_tile(h: int) -> int:
    for tr in (8, 4, 2):
        if h % tr == 0:
            return tr
    return 1


def _interp_mats(x0r, x1r, wxr, w):
    """(W, W) one-hot interpolation matrix P[w_src, j_out] and its
    x-derivative, from (1, W) per-row index/weight vectors (f32-valued
    integers: small ints compare exactly, and f32 avoids the
    nondiff-int-arg custom_vjp restriction)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    h0 = (iota == x0r.astype(jnp.int32)).astype(wxr.dtype)
    h1 = (iota == x1r.astype(jnp.int32)).astype(wxr.dtype)
    return h0 * (1.0 - wxr) + h1 * wxr, h1 - h0


def _fwd_kernel(v0, v1, v2, x0i, x1i, wx, wy, sel, out, *, tr, w):
    # coordinate rows (x0i/x1i/wx/wy/sel) arrive f32 regardless of the
    # image dtype (bf16 can't represent integer coords > 256); the row
    # math runs f32 and only the store quantizes to the output dtype
    def row(j, _):
        selr = sel[0, j].reshape(1, w)
        lo = jnp.where(selr == 0.0, v0[0, j], v1[0, j]).astype(jnp.float32)
        hi = jnp.where(selr == 0.0, v1[0, j], v2[0, j]).astype(jnp.float32)
        wyr = wy[0, j].reshape(1, w)
        mixed = (1.0 - wyr) * lo + wyr * hi                  # (C, W)
        pt, _ = _interp_mats(x0i[0, j].reshape(1, w),
                             x1i[0, j].reshape(1, w),
                             wx[0, j].reshape(1, w), w)
        out[0, j] = jax.lax.dot_general(
            mixed, pt, (((1,), (0,)), ((), ())),
            preferred_element_type=mixed.dtype).astype(out.dtype)
        return 0
    jax.lax.fori_loop(0, tr, row, 0)


def _bwd_kernel(v0, v1, v2, x0i, x1i, wx, wy, sel, g,
                gv0, gv1, gv2, gwx, gwy, *, tr, w):
    def row(j, _):
        selr = sel[0, j].reshape(1, w)
        lo = jnp.where(selr == 0.0, v0[0, j], v1[0, j]).astype(jnp.float32)
        hi = jnp.where(selr == 0.0, v1[0, j], v2[0, j]).astype(jnp.float32)
        wyr = wy[0, j].reshape(1, w)
        mixed = (1.0 - wyr) * lo + wyr * hi
        pt, dpt = _interp_mats(x0i[0, j].reshape(1, w),
                               x1i[0, j].reshape(1, w),
                               wx[0, j].reshape(1, w), w)
        gr = g[0, j].astype(jnp.float32)                      # (C, W)
        # d/d mixed: gm[c, w] = sum_j g[c, j] * pt[w, j]
        gm = jax.lax.dot_general(gr, pt, (((1,), (1,)), ((), ())),
                                 preferred_element_type=gr.dtype)
        glo = (1.0 - wyr) * gm
        ghi = wyr * gm
        zero = jnp.zeros_like(gm)
        gv0[0, j] = jnp.where(selr == 0.0, glo, zero).astype(gv0.dtype)
        gv1[0, j] = jnp.where(selr == 0.0, ghi, glo).astype(gv1.dtype)
        gv2[0, j] = jnp.where(selr == 0.0, zero, ghi).astype(gv2.dtype)
        # d/d wx: per out col j, sum_c g * (mixed @ dpt)
        diff = jax.lax.dot_general(mixed, dpt, (((1,), (0,)), ((), ())),
                                   preferred_element_type=mixed.dtype)
        gwx[0, j] = jnp.sum(gr * diff, axis=0).astype(gwx.dtype)
        # d/d wy (as materialized per src col w): sum_c gm * (hi - lo)
        gwy[0, j] = jnp.sum(gm * (hi - lo), axis=0).astype(gwy.dtype)
        return 0
    jax.lax.fori_loop(0, tr, row, 0)


def _views(src_nhcw):
    """Edge-padded row views: view_k local row g holds source row
    g + k - 1 (clamped)."""
    padded = jnp.concatenate(
        [src_nhcw[:, :1], src_nhcw, src_nhcw[:, -1:]], axis=1)
    h = src_nhcw.shape[1]
    return padded[:, 0:h], padded[:, 1:h + 1], padded[:, 2:h + 2]


def _pad_w(a, wp, axis):
    pad = wp - a.shape[axis]
    if pad == 0:
        return a
    cfg = [(0, 0)] * a.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(a, cfg)


@jax.custom_vjp
def _banded_core(src_nhcw, wx, wyv, selv, x0f, x1f):
    out, _ = _banded_fwd(src_nhcw, wx, wyv, selv, x0f, x1f)
    return out


def _call(kernel, n_out, src_nhcw, x0i, x1i, wx, wyv, selv, extra=()):
    n, h, c, w = src_nhcw.shape
    tr = _row_tile(h)
    wp = -(-w // 128) * 128
    interpret = jax.default_backend() not in ("tpu", "axon")
    if interpret:
        wp = w
    v0, v1, v2 = _views(_pad_w(src_nhcw, wp, 3))
    x0i, x1i = _pad_w(x0i, wp, 2), _pad_w(x1i, wp, 2)
    wx, wyv, selv = (_pad_w(a, wp, 2) for a in (wx, wyv, selv))
    extra = tuple(_pad_w(a, wp, 3) for a in extra)

    img_spec = pl.BlockSpec((1, tr, c, wp), lambda i, r: (i, r, 0, 0))
    row_spec = pl.BlockSpec((1, tr, wp), lambda i, r: (i, r, 0))
    in_specs = ([img_spec] * 3 + [row_spec] * 5
                + [img_spec] * len(extra))
    shapes, out_specs = [], []
    for kind in n_out:
        if kind == "img":
            shapes.append(
                jax.ShapeDtypeStruct((n, h, c, wp), src_nhcw.dtype))
            out_specs.append(img_spec)
        else:
            # row outputs are cotangents of the f32 coordinate rows
            shapes.append(jax.ShapeDtypeStruct((n, h, wp), wx.dtype))
            out_specs.append(row_spec)
    res = pl.pallas_call(
        functools.partial(kernel, tr=tr, w=wp),
        grid=(n, h // tr),
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=shapes if len(shapes) > 1 else shapes[0],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(v0, v1, v2, x0i, x1i, wx, wyv, selv, *extra)
    res = res if isinstance(res, (tuple, list)) else (res,)
    return tuple(r[..., :w] if r.shape[-1] != w else r for r in res)


def _banded_fwd(src_nhcw, wx, wyv, selv, x0f, x1f):
    (out,) = _call(_fwd_kernel, ("img",), src_nhcw, x0f, x1f, wx, wyv,
                   selv)
    return out, (src_nhcw, wx, wyv, selv, x0f, x1f)


def _banded_bwd(res, g):
    src_nhcw, wx, wyv, selv, x0f, x1f = res
    n, h, c, w = src_nhcw.shape
    gv0, gv1, gv2, gwx, gwy = _call(
        _bwd_kernel, ("img", "img", "img", "row", "row"),
        src_nhcw, x0f, x1f, wx, wyv, selv, extra=(g,))
    # view_k local row g wrote grads for source row g + k - 1 (clamped):
    # shift-add the three back onto the source rows.
    gsrc = gv1
    gsrc = gsrc.at[:, :h - 1].add(gv0[:, 1:])
    gsrc = gsrc.at[:, 0].add(gv0[:, 0])          # clamped top row
    gsrc = gsrc.at[:, 1:].add(gv2[:, :h - 1])
    gsrc = gsrc.at[:, h - 1].add(gv2[:, h - 1])  # clamped bottom row
    return (gsrc, gwx, gwy, jnp.zeros_like(selv),
            jnp.zeros_like(x0f), jnp.zeros_like(x1f))


_banded_core.defvjp(_banded_fwd, _banded_bwd)


def grid_sample_border_banded(img: Array, grid: Array) -> Array:
    """`grid_sample_border` for row-banded grids (stereo reprojection):
    same (N, H, W, C) / (N, Ho, Wo, 2) interface, |y(row) - row| <= 1
    required (guaranteed by the rectified-stereo projection; see module
    docstring). Exact vs the gather path to ~1e-6 (per-row y read at
    column 0)."""
    img = jnp.asarray(img)
    grid = jnp.asarray(grid)  # raw numpy would promote bf16+float to f32
    # output dtype matches the gather path's promotion semantics (bf16
    # img x f32 grid -> f32 out); coordinate/weight math is pinned to
    # f32 like _bilinear_gather (bf16 can't represent integer coords
    # > 256: clip(x, 0, 639) would round to 640 and the one-hot compare
    # would match no column)
    dt = jnp.promote_types(img.dtype, grid.dtype)
    img = img.astype(dt)
    grid = grid.astype(jnp.float32)
    n, h, w, c = img.shape
    u = grid[..., 0]
    v = grid[..., 1]
    x = jnp.clip(((u + 1.0) * w - 1.0) * 0.5, 0.0, w - 1.0)
    yr = jnp.clip(((v[:, :, 0] + 1.0) * h - 1.0) * 0.5, 0.0, h - 1.0)

    x0 = jnp.floor(x)
    wx = x - x0
    x0f = jax.lax.stop_gradient(x0)
    x1f = jnp.minimum(x0f + 1.0, w - 1.0)

    y0 = jnp.floor(yr)
    wy = yr - y0
    row = jnp.arange(h, dtype=y0.dtype)[None, :]
    # y0 in {row-1, row}: sel = 0 selects the (row-1, row) pair
    sel = jnp.clip(y0 - (row - 1.0), 0.0, 1.0)
    wyv = jnp.broadcast_to(wy[:, :, None], (n, h, w))
    selv = jax.lax.stop_gradient(
        jnp.broadcast_to(sel[:, :, None], (n, h, w)))

    src = jnp.transpose(img, (0, 1, 3, 2))            # (N, H, C, W)
    out = _banded_core(src, wx, wyv, selv, x0f, x1f)
    return jnp.transpose(out, (0, 1, 3, 2))

"""Capacity-based tile-sparse convolution — pure-XLA sparse execution.

Third execution strategy for the wavelet decoder's threshold-gated convs
(alongside the masked-dense oracle and the Pallas tile-skip kernels):
cut the image into (TH, TW) tiles, rank tiles by output-mask activity,
gather the top-K tiles (K static — a capacity ratio of the tile count)
with their conv halos into a compact (K, TH+2, TW+2, C) batch, run ONE
dense VALID conv over it, and scatter the results back. Inactive tiles
produce zeros.

This is the MoE-capacity trick applied to spatial sparsity: compute and
intermediate traffic scale with K instead of H*W, shapes stay static,
and everything is stock XLA (gathers on tile rows, conv, scatter) — no
custom kernels, works on any backend, differentiable.

Exactness: identical to the masked-dense oracle whenever the number of
active tiles is <= K (checkable via `tile_overflow`). When it overflows,
the lowest-activity tiles are dropped — a graceful-degradation knob the
reference's engine doesn't have (it OOMs time instead).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .convops import conv2d
from .image import pad2d

Array = jnp.ndarray


def _tile_activity(out_mask: Array, th: int, tw: int):
    """(N, H, W, 1) -> per-tile active-pixel counts (N, nT)."""
    n, h, w = out_mask.shape[0], out_mask.shape[1], out_mask.shape[2]
    hp, wp = -(-h // th) * th, -(-w // tw) * tw
    m = jnp.pad(out_mask[..., 0], ((0, 0), (0, hp - h), (0, wp - w)))
    m = m.reshape(n, hp // th, th, wp // tw, tw)
    return m.sum(axis=(2, 4)).reshape(n, -1), (hp, wp)


def tile_overflow(out_mask: Array, th: int, tw: int,
                  capacity: int) -> Array:
    """Number of active tiles beyond capacity, per image (0 = exact)."""
    act, _ = _tile_activity(out_mask, th, tw)
    return jnp.maximum((act > 0).sum(axis=1) - capacity, 0)


def conv_capacity_overflow(out_mask: Array, th: int = 16, tw: int = 64,
                           capacity_ratio: float = 0.5) -> Array:
    """Total dropped active tiles (summed over the batch) for one
    conv3x3_capacity_sparse call with the same defaults (0 = exact).
    Replicates the per-image K formula inside the conv."""
    h, w = out_mask.shape[1], out_mask.shape[2]
    n_tiles = (-(-h // th)) * (-(-w // tw))
    k = min(n_tiles, max(1, int(-(-n_tiles * capacity_ratio // 1))))
    return tile_overflow(out_mask, th, tw, k).sum()


@functools.partial(jax.jit, static_argnames=("pad_mode", "nonlin", "th",
                                             "tw", "capacity_ratio"))
def conv3x3_capacity_sparse(x: Array, w: Array, b: Array,
                            out_mask: Array,
                            pad_mode: str = "reflect",
                            nonlin: Optional[Callable] = None,
                            th: int = 16, tw: int = 64,
                            capacity_ratio: float = 0.5) -> Array:
    """Masked 3x3 conv computing only the top-K active (th x tw) tiles.

    Args:
      x: (N, H, W, Cin). w: (3, 3, Cin, Cout) HWIO. b: (Cout,).
      out_mask: (N, H, W, 1) {0,1}.
      capacity_ratio: K = ceil(ratio * n_tiles) compact slots per image.
    Returns (N, H, W, Cout) == nonlin(conv3x3(pad(x))) * out_mask when
    active tiles <= K (see tile_overflow).
    """
    n, h, w_img, cin = x.shape
    cout = w.shape[-1]
    act, (hp, wp) = _tile_activity(out_mask, th, tw)
    n_h, n_w = hp // th, wp // tw
    n_tiles = n_h * n_w
    k = min(n_tiles, max(1, int(-(-n_tiles * capacity_ratio // 1))))

    xp = pad2d(x, 1, pad_mode)                       # (N, H+2, W+2, C)
    xp = jnp.pad(xp, ((0, 0), (0, hp - h), (0, wp - w_img), (0, 0)))

    _, idx = jax.lax.top_k(act, k)                   # (N, K) tile ids
    ih = idx // n_w
    iw = idx % n_w
    # gather halo tiles: rows (K, th+2), cols (K, tw+2) fancy-index
    rows = ih[..., None] * th + jnp.arange(th + 2)   # (N, K, th+2)
    cols = iw[..., None] * tw + jnp.arange(tw + 2)   # (N, K, tw+2)
    # (N, K, th+2, tw+2, C)
    tiles = jax.vmap(
        lambda img, r, c: img[r[:, :, None], c[:, None, :], :]
    )(xp, rows, cols)

    y = conv2d(tiles.reshape(n * k, th + 2, tw + 2, cin), w, b)
    if nonlin is not None:
        y = nonlin(y)
    y = y.reshape(n, k, th, tw, cout)

    # mask tiles gathered the same way (no halo)
    maskp = jnp.pad(out_mask, ((0, 0), (0, hp - h), (0, wp - w_img),
                               (0, 0)))
    mrows = ih[..., None] * th + jnp.arange(th)
    mcols = iw[..., None] * tw + jnp.arange(tw)
    mtiles = jax.vmap(
        lambda m, r, c: m[r[:, :, None], c[:, None, :], :]
    )(maskp, mrows, mcols)
    y = y * mtiles

    # scatter back (duplicate tile ids can't happen: top_k is distinct)
    out_tiles = jnp.zeros((n, n_tiles, th, tw, cout), y.dtype)
    out_tiles = jax.vmap(lambda o, i, v: o.at[i].set(v))(out_tiles, idx,
                                                         y)
    out = out_tiles.reshape(n, n_h, n_w, th, tw, cout).transpose(
        0, 1, 3, 2, 4, 5).reshape(n, hp, wp, cout)
    return out[:, :h, :w_img]

"""Block-granular gather/scatter for the tile-compact sparse engine.

Round-2 measurements (PERF.md round-2b): XLA runs convs over compacted
tile batches at full speed (0.32 ms vs the 3.67 ms dense stage), but
every XLA formulation of halo-window gather / tile scatter is 5-100x
off DMA bandwidth (pretile+take 2.64 ms, vmap(dynamic_slice) 3.5 ms,
windowed lax.scatter 5.8 ms). Only contiguous flat-row take/scatter is
fast — and halo windows are not flat rows.

These two Pallas kernels close that gap with the TPU's own machinery:

  band_gather: grid over the K active tiles; TWO input BlockSpecs view
    the same W-halo-tiled stack at vertically adjacent tile-blocks, with
    scalar-prefetched index maps (the per-step block index comes from
    the active-tile list). The Pallas pipeline double-buffers the block
    DMAs automatically; the kernel body just stitches the (th + halo)
    window out of the 2-tile band. ~1.33x read amplification, zero
    per-element work.

  block_scatter: grid over K; the OUTPUT BlockSpec's index map is
    scalar-prefetched, so each step's (th, tw, C) tile streams straight
    to its (n, ty, tx) home in the dense result. A donated zeros
    operand (input_output_aliases) provides the inactive-tile zeros.

Everything else in the engine is stock XLA on compacted (K, ...) tile
batches. No torch/CUDA analogue: this is the reference gather engine
(`KITTI/layers.py:409-480`) re-shaped for a DMA+MXU machine.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_PAD_MODES = {"reflect": "reflect", "zero": "constant",
              "replicate": "edge"}


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def wtile_stack(x: Array, th: int, tw: int, halo: int,
                pad_mode: str = "reflect") -> Array:
    """(N, H, W, C) -> (N, nw, nh+1, th, tw + 2*halo, C): W-halo-tiled,
    H split into th-row blocks so a window of th + 2*halo rows starting
    at any tile row lives in two vertically adjacent blocks.

    The image is padded by `halo` with pad_mode (the oracle's pad2d
    around the true image), then zero-extended to the block grid."""
    n, h, w, c = x.shape
    assert th >= 2 * halo and tw >= 2 * halo, \
        "band windows need tile >= 2*halo"
    nh, nw = -(-h // th), -(-w // tw)
    if halo:
        x = jnp.pad(x, ((0, 0), (halo, halo), (halo, halo), (0, 0)),
                    mode=_PAD_MODES[pad_mode])
    x = jnp.pad(x, ((0, 0), (0, (nh + 1) * th - x.shape[1]),
                    (0, nw * tw + 2 * halo - x.shape[2]), (0, 0)))
    cols = jnp.stack([x[:, :, j * tw:j * tw + tw + 2 * halo]
                      for j in range(nw)], axis=1)
    return cols.reshape(n, nw, nh + 1, th, tw + 2 * halo, c)


def _band_kernel(th, wh, idx_ref, top_ref, bot_ref, out_ref):
    if wh > th:
        out_ref[0, :th] = top_ref[0, 0, 0]
        out_ref[0, th:] = bot_ref[0, 0, 0, :wh - th]
    else:
        out_ref[0] = top_ref[0, 0, 0, :wh]


@functools.partial(jax.jit, static_argnames=("th", "window_h",
                                             "interpret"))
def band_gather(stack: Array, idx: Array, th: int, window_h: int,
                interpret: Optional[bool] = None) -> Array:
    """Gather halo windows for the active tiles.

    Args:
      stack: (N, nw, nh+1, th, twp, C) from wtile_stack.
      idx: (K, 3) int32 rows (n, ty, tx); ty in [0, nh).
      window_h: rows per window (th + 2*halo), must be <= 2*th.
    Returns (K, window_h, twp, C).
    """
    if interpret is None:
        interpret = _interpret()
    n, nw, nhp, th_, twp, c = stack.shape
    assert th_ == th and window_h <= 2 * th
    k = idx.shape[0]

    def top_map(i, idx_ref):
        return (idx_ref[i, 0], idx_ref[i, 2], idx_ref[i, 1], 0, 0, 0)

    def bot_map(i, idx_ref):
        return (idx_ref[i, 0], idx_ref[i, 2], idx_ref[i, 1] + 1, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, 1, 1, th, twp, c), top_map),
            pl.BlockSpec((1, 1, 1, th, twp, c), bot_map),
        ],
        out_specs=pl.BlockSpec((1, window_h, twp, c),
                               lambda i, idx_ref: (i, 0, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_band_kernel, th, window_h),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, window_h, twp, c),
                                       stack.dtype),
        interpret=interpret,
    )(idx, stack, stack)


def _scatter_kernel(idx_ref, vals_ref, zeros_ref, out_ref):
    out_ref[...] = vals_ref[...]


@functools.partial(jax.jit, static_argnames=("n", "nh", "nw",
                                             "interpret"))
def block_scatter(vals: Array, idx: Array, n: int, nh: int, nw: int,
                  interpret: Optional[bool] = None) -> Array:
    """Scatter (K, th, tw, C) tiles to a dense (N, nh*th, nw*tw, C)
    zeros canvas at block positions idx (K, 3) = (n, ty, tx). Distinct
    (duplicate-free) idx rows required for active tiles; rows may point
    at inactive tiles (their vals must be zero, which the engine's
    masks guarantee)."""
    if interpret is None:
        interpret = _interpret()
    k, th, tw, c = vals.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, th, tw, c), lambda i, idx_ref: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, c),
            lambda i, idx_ref: (idx_ref[i, 0], idx_ref[i, 1],
                                idx_ref[i, 2], 0)),
    )
    zeros = jnp.zeros((n, nh * th, nw * tw, c), vals.dtype)
    return pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, nh * th, nw * tw, c),
                                       vals.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(idx, vals, zeros)

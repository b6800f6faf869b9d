"""Whole-stage tile compaction: the TPU-native sparse decoder execution.

The reference converts wavelet sparsity to wall-clock with a per-pixel
gather/scatter engine (`KITTI/layers.py:409-508`). Per-pixel gathers are
hostile to the TPU's (8,128) vector tiles, and round-1 showed per-CONV
tile granularity loses too: every conv-sized Pallas call or XLA gather
pays pad/tile materializations larger than the conv it saves (PERF.md).

This module compacts at the WHOLE-STAGE granularity instead. One decoder
scale (upconv0 -> nearest-x2 upsample + skip concat -> upconv1 -> fused
pos/neg waveconv heads) is executed on a compacted batch of active tiles:

  1. pre-tile x / skip / masks into overlapping halo windows (static
     slices, one bandwidth pass),
  2. ONE leading-axis `take` gathers the top-K active tiles across the
     whole batch (K = static capacity; whole contiguous tiles, so the
     gather is a block copy, not an element gather),
  3. the entire stage runs as stock XLA convs over the (K, th+h, tw+h, C)
     tile batch — MXU-tiled by XLA, halo overlap recomputed,
  4. ONE scatter writes yh and the next scale's features back (inactive
     tiles are exact zeros under the stage masks).

Compute and traffic scale with the number of ACTIVE tiles; shapes stay
static; no custom kernels. Exactness: identical to the masked-dense
oracle (`ops/sparse.py`) at every pixel further than 2 high-res px from
the IMAGE border whenever active tiles <= K (the oracle reflect-pads
intermediate feature maps at the image border, tiles reflect-pad their
inputs — same contract as `ops/pallas_fused.py`; tile seams in the
interior are exact because halos are recomputed from the same inputs).
Overflowing K drops the lowest-activity tiles (graceful degradation the
reference does not have — it runs out of time instead).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .convops import conv2d
from .image import upsample_nearest2x
from .sparse import stage_masks

Array = jnp.ndarray


def _pretile(x: Array, th: int, tw: int, nh: int, nw: int,
             halo: int, pad_mode: str = "reflect") -> Array:
    """(N, H, W, C) -> (N * nh * nw, th + 2*halo, tw + 2*halo, C) halo
    windows. The image is reflect-padded by `halo` first (matching the
    oracle's pad2d around the true image), then zero-extended to the tile
    grid; windows are static slices (nh row slabs x nw column slabs)."""
    n, h, w, c = x.shape
    if halo:
        x = jnp.pad(x, ((0, 0), (halo, halo), (halo, halo), (0, 0)),
                    mode={"reflect": "reflect", "zero": "constant",
                          "replicate": "edge"}[pad_mode])
    x = jnp.pad(x, ((0, 0), (0, nh * th + 2 * halo - x.shape[1]),
                    (0, nw * tw + 2 * halo - x.shape[2]), (0, 0)))
    rows = jnp.stack([x[:, i * th:i * th + th + 2 * halo] for i in
                      range(nh)], axis=1)      # (N, nh, th+2h, Wp, C)
    tiles = jnp.stack([rows[:, :, :, j * tw:j * tw + tw + 2 * halo]
                       for j in range(nw)], axis=2)
    return tiles.reshape(n * nh * nw, th + 2 * halo, tw + 2 * halo, c)


def _scatter(vals: Array, idx: Array, n: int, nh: int, nw: int,
             th: int, tw: int, h: int, w: int) -> Array:
    """(K, th, tw, C) compacted tiles -> dense (N, H, W, C); unselected
    tiles are zeros (exact: their stage masks are all zero)."""
    c = vals.shape[-1]
    out = jnp.zeros((n * nh * nw, th, tw, c), vals.dtype)
    out = out.at[idx].set(vals)
    out = out.reshape(n, nh, nw, th, tw, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(n, nh * th, nw * tw, c)
    return out[:, :h, :w]


def default_tile_shape(hh: int, wh: int) -> tuple[int, int]:
    """High-res tile shape for a stage with high-res dims (hh, wh):
    (8, 32) when the image is >= 64 wide, shrunk (to multiples of 8,
    even so the low-res tile is integral) to avoid mostly-padding tiles
    on small scales. 32 lanes, not 128: the tile is a COUNTING/
    compaction granule (tile_scores/top-K), not a VMEM block — finer
    tiles track thin edge masks better and the Pallas block IO pads to
    lane width itself."""
    # th=8 keeps the low-res tile (th/2 = 4) >= 2*halo, the blockio band
    # invariant (window_h <= 2 * tile rows); undersized scales just pad.
    th = 8
    tw = 32 if wh >= 64 else max(16, min(32, -(-wh // 16) * 8))
    return th, tw


def tile_scores(mask: Array, th: int, tw: int) -> Array:
    """Per-tile active-pixel counts of an (N, H, W, 1) mask, flattened to
    (N * nT,) in the same order `_pretile` emits tiles."""
    n, h, w = mask.shape[0], mask.shape[1], mask.shape[2]
    nh, nw = -(-h // th), -(-w // tw)
    m = jnp.pad(mask[..., 0], ((0, 0), (0, nh * th - h), (0, nw * tw - w)))
    m = m.reshape(n, nh, th, nw, tw)
    return m.sum(axis=(2, 4)).reshape(-1)


def stage_overflow(upconv1_mask: Array, th: int, tw: int,
                   capacity: int) -> Array:
    """Active tiles beyond capacity for a stage's upconv1 mask (0 = the
    compacted stage is exact in the interior)."""
    scores = tile_scores(upconv1_mask, th, tw)
    return jnp.maximum((scores > 0).sum() - capacity, 0)


def stage_capacity_overflow(mask: Array, th: int, tw: int,
                            cap_ratio: float) -> Array:
    """Dropped active tiles for one compact_wave_stage call (0 = the
    stage matches the oracle in the interior). Replicates the K formula
    and upconv1 tile scoring used inside compact_wave_stage."""
    n, h_l, w_l = mask.shape[0], mask.shape[1], mask.shape[2]
    hh, wh = 2 * h_l, 2 * w_l
    nh, nw = -(-hh // th), -(-wh // tw)
    n_tiles = nh * nw
    k = min(n * n_tiles, max(1, math.ceil(n * n_tiles * cap_ratio)))
    return stage_overflow(stage_masks(mask)["upconv1"], th, tw, k)


def _stage_compute(xg, sg, m_u0, m_up, m_u1, m_wv,
                   w0, b0, w1, b1, wp1, bp1, wp3, bp3,
                   wn1, bn1, wn3, bn3, i_scale):
    """The decoder scale on a compacted (K, ...) tile batch — stock XLA
    convs (measured at full efficiency on these shapes, PERF.md
    round-2b). Inputs are halo windows: xg (K, hlt+4, wlt+4, Cx),
    sg (K, th+4, tw+4, Cs), masks at their own halos."""
    cd = w0.shape[-1]
    x0 = jax.nn.elu(conv2d(xg, w0, b0)) * m_u0           # (K, hlt+2, wlt+2, Cd)
    u = upsample_nearest2x(x0) * m_up                    # (K, th+4, tw+4, Cd)
    cat = jnp.concatenate([u, sg], axis=-1)
    x1 = jax.nn.elu(conv2d(cat, w1, b1)) * m_u1          # (K, th+2, tw+2, Cd)

    # fused pos+neg heads: one 1x1 (Cd->2Cd), one block-diagonal 3x3
    # (2Cd->6); exact — zero blocks contribute exact zeros (see
    # decoders_kitti._paired_heads)
    w1h = jnp.concatenate([wp1, wn1], axis=-1)
    b1h = jnp.concatenate([bp1, bn1])
    hcat = conv2d(x1, w1h, b1h)
    hcat = jnp.where(hcat >= 0, hcat, 0.1 * hcat) * m_u1
    w3 = jnp.zeros((3, 3, 2 * cd, 6), x1.dtype)
    w3 = w3.at[:, :, :cd, :3].set(wp3)
    w3 = w3.at[:, :, cd:, 3:].set(wn3)
    b3 = jnp.concatenate([bp3, bn3])
    y = jax.nn.sigmoid(conv2d(hcat, w3, b3))             # (K, th, tw, 6)
    yh_t = (2.0 ** (i_scale - 1)) * (y[..., :3] - y[..., 3:]) * m_wv
    return yh_t, x1[:, 1:-1, 1:-1, :]


@functools.partial(jax.jit, static_argnames=("i_scale", "th", "tw",
                                             "cap_ratio", "io"))
def compact_wave_stage(x: Array, skip: Array, mask: Array,
                       w0: Array, b0: Array, w1: Array, b1: Array,
                       wp1: Array, bp1: Array, wp3: Array, bp3: Array,
                       wn1: Array, bn1: Array, wn3: Array, bn3: Array,
                       i_scale: int, th: int = 8, tw: int = 32,
                       cap_ratio: float = 0.5, io: str = "pallas"):
    """One sparse decoder scale on a compacted active-tile batch.

    Args:
      x: (N, Hl, Wl, Cx) scale entry features (already masked by the
         PREVIOUS stage's upconv1 mask, as the decoder chains them).
      skip: (N, 2Hl, 2Wl, Cs) encoder skip.
      mask: (N, Hl, Wl, 1) raw threshold mask for this scale.
      w0/b0: upconv0 (3x3, Cx->Cd). w1/b1: upconv1 (3x3, Cd+Cs->Cd).
      wp*/wn*: pos/neg waveconv head params (1x1 Cd->Cd then 3x3 Cd->3).
      th, tw: HIGH-res tile shape. cap_ratio: K = ceil(ratio * N * nT).
      io: 'pallas' = block-granular gather/scatter kernels
          (ops/blockio.py — the fast path; XLA's window gathers and
          tile scatters are 5-100x off DMA bandwidth, PERF.md
          round-2b); 'xla' = pretile+take / stack-scatter reference.
    Returns:
      yh (N, 2Hl, 2Wl, 3) and x1 (N, 2Hl, 2Wl, Cd) — both exactly zero
      outside their stage masks, matching the masked-dense oracle in the
      interior (see module docstring for the border contract).
    """
    n, h_l, w_l, cx = x.shape
    hh, wh = 2 * h_l, 2 * w_l
    hlt, wlt = th // 2, tw // 2
    nh, nw = -(-hh // th), -(-wh // tw)
    n_tiles = nh * nw
    k = min(n * n_tiles, max(1, math.ceil(n * n_tiles * cap_ratio)))

    masks = stage_masks(mask)

    # dense pre-masking (bandwidth-only; reproduces the oracle's input
    # masking so tile halos see masked values)
    x = x * masks["lowres"]
    skip = skip * masks["upsample"]

    # top-K active tiles across the whole batch (global capacity pool)
    scores = tile_scores(masks["upconv1"], th, tw)
    _, tid = jax.lax.top_k(scores, k)

    prm = (w0, b0, w1, b1, wp1, bp1, wp3, bp3, wn1, bn1, wn3, bn3)
    if io == "pallas":
        from .blockio import band_gather, block_scatter, wtile_stack
        bb = tid // n_tiles
        ty = (tid // nw) % nh
        tx = tid % nw
        idx = jnp.stack([bb, ty, tx], axis=-1).astype(jnp.int32)
        # low-res tiles share the same (n, ty, tx) grid at half size
        xg = band_gather(wtile_stack(x, hlt, wlt, 2), idx, hlt, hlt + 4)
        sg = band_gather(wtile_stack(skip, th, tw, 2), idx, th, th + 4)
        m_u0 = band_gather(wtile_stack(masks["upconv0"], hlt, wlt, 1),
                           idx, hlt, hlt + 2)
        m_up = band_gather(wtile_stack(masks["upsample"], th, tw, 2),
                           idx, th, th + 4)
        m_u1 = band_gather(wtile_stack(masks["upconv1"], th, tw, 1),
                           idx, th, th + 2)
        m_wv = band_gather(wtile_stack(masks["wavelet"], th, tw, 0),
                           idx, th, th)
        yh_t, x1_t = _stage_compute(xg, sg, m_u0, m_up, m_u1, m_wv,
                                    *prm, i_scale=i_scale)
        yh = block_scatter(yh_t, idx, n, nh, nw)[:, :hh, :wh]
        x1d = block_scatter(x1_t, idx, n, nh, nw)[:, :hh, :wh]
        return yh, x1d

    take = lambda t: jnp.take(t, tid, axis=0)
    xg = take(_pretile(x, hlt, wlt, nh, nw, 2))          # (K, hlt+4, wlt+4, Cx)
    sg = take(_pretile(skip, th, tw, nh, nw, 2))         # (K, th+4, tw+4, Cs)
    m_u0 = take(_pretile(masks["upconv0"], hlt, wlt, nh, nw, 1))
    m_up = take(_pretile(masks["upsample"], th, tw, nh, nw, 2))
    m_u1 = take(_pretile(masks["upconv1"], th, tw, nh, nw, 1))
    m_wv = take(_pretile(masks["wavelet"], th, tw, nh, nw, 0))
    yh_t, x1_t = _stage_compute(xg, sg, m_u0, m_up, m_u1, m_wv,
                                *prm, i_scale=i_scale)
    yh = _scatter(yh_t, tid, n, nh, nw, th, tw, hh, wh)
    x1d = _scatter(x1_t, tid, n, nh, nw, th, tw, hh, wh)
    return yh, x1d

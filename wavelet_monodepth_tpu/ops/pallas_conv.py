"""Pallas tile-sparse 3x3 convolution — the kernel that turns wavelet
coefficient sparsity into wall-clock savings on TPU.

The reference's sparse engine gathers individual active pixels
(`KITTI/layers.py:409-480`) — per-pixel gather/scatter is hostile to the
TPU's (8,128) vector tiles, and data-dependent shapes don't exist under
XLA. Instead each image is cut into row stripes of TH rows; per-stripe
activity flags are reduced from the output mask on the XLA side and
prefetched as scalars; inactive stripes skip BOTH the input DMA (the
stripe's (TH+2, W+2, C) halo window never leaves HBM) and the 9-shift
MXU matmuls, writing zeros. Active stripes compute the exact
masked-dense result (ops/sparse.py), so the kernel is bit-compatible
with the oracle at every threshold. Batched inputs run on a
(batch, stripe) grid with per-image flags (per-image thresholds come
from ops/sparse.wavelet_threshold_mask).

Row stripes (not 2D tiles) because Mosaic only supports runtime
slicing/DMA on leading memref dimensions; a (TH, TW)+halo window needs
lane-unaligned slices that fail to lower. The manually DMA'd window must
also match the physical layout exactly, so channels are padded to the
128-lane width and W+2 to a sublane multiple of 8. Stripe compute:
pixels on sublanes, channels on lanes, conv as 9 accumulated
(TH, W, C) x (C, Cout) dot_generals with bias/nonlinearity/output-mask
fused into the epilogue.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .image import pad2d

Array = jnp.ndarray


# Mosaic-safe nonlinearities (jax.nn.elu lowers to expm1, which Pallas TPU
# does not implement).
def elu(x: Array) -> Array:
    return jnp.where(x > 0, x, jnp.exp(x) - 1.0)


def sigmoid(x: Array) -> Array:
    return 1.0 / (1.0 + jnp.exp(-x))


def leaky_relu_01(x: Array) -> Array:
    return jnp.where(x > 0, x, 0.1 * x)


def leaky_relu_02(x: Array) -> Array:
    return jnp.where(x > 0, x, 0.2 * x)


def _conv_kernel(nonlin, th, w_img, cin, cout, n_h, flat_dots,
                 flags_ref, xp_ref, w_ref, b_ref, mask_ref, out_ref,
                 xs_ref, sem):
    n = pl.program_id(0)
    i = pl.program_id(1)
    flag = flags_ref[n * n_h + i]

    @pl.when(flag > 0)
    def _active():
        dma = pltpu.make_async_copy(
            xp_ref.at[n, pl.ds(i * th, th + 2)], xs_ref, sem)
        dma.start()
        dma.wait()
        if flat_dots:
            acc = jnp.zeros((th * w_img, cout), jnp.float32)
            for ky in range(3):
                for kx in range(3):
                    patch = xs_ref[ky:ky + th, kx:kx + w_img, :]
                    acc = acc + jnp.dot(
                        patch.reshape(th * w_img, cin),
                        w_ref[ky * 3 + kx],
                        preferred_element_type=jnp.float32)
            y = acc.reshape(th, w_img, cout)
        else:
            # contract channels directly on the 3-D tile — no reshape
            # relayouts; Mosaic lowers this as a batched matmul
            acc = jnp.zeros((th, w_img, cout), jnp.float32)
            for ky in range(3):
                for kx in range(3):
                    patch = xs_ref[ky:ky + th, kx:kx + w_img, :]
                    acc = acc + jax.lax.dot_general(
                        patch, w_ref[ky * 3 + kx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            y = acc
        y = y + b_ref[0, 0]
        if nonlin is not None:
            y = nonlin(y)
        out_ref[...] = y * mask_ref[...]

    @pl.when(flag == 0)
    def _inactive():
        out_ref[...] = jnp.zeros_like(out_ref)


def stripe_flags(out_mask: Array, th: int) -> Array:
    """Per-image, per-row-stripe any-active flags from an (N, H, W, 1)
    {0,1} mask. Returns int32 (N * nH,)."""
    n, h = out_mask.shape[0], out_mask.shape[1]
    hp = -(-h // th) * th
    m = jnp.pad(out_mask[..., 0], ((0, 0), (0, hp - h), (0, 0)))
    m = m.reshape(n, hp // th, th, -1)
    return (jnp.max(m, axis=(2, 3)) > 0).astype(jnp.int32).reshape(-1)


# kept for API compatibility with earlier callers/tests
def tile_flags(out_mask: Array, th: int, tw: int) -> Array:
    h, w, _ = out_mask.shape
    hp, wp = -(-h // th) * th, -(-w // tw) * tw
    m = jnp.pad(out_mask[..., 0], ((0, hp - h), (0, wp - w)))
    m = m.reshape(hp // th, th, wp // tw, tw)
    return (jnp.max(m, axis=(1, 3)) > 0).astype(jnp.int32).reshape(-1)


def conv3x3_tile_sparse(x: Array, w: Array, b: Array, out_mask: Array,
                        pad_mode: str = "reflect",
                        nonlin: Optional[Callable] = None,
                        th: int = 8,
                        interpret: Optional[bool] = None,
                        flat_dots: bool = False) -> Array:
    """Masked 3x3 conv with row-stripe skipping.

    Args:
      x: (H, W, Cin) or (N, H, W, Cin) — already input-masked if the
        stage requires it.
      w: (3, 3, Cin, Cout) HWIO. b: (Cout,).
      out_mask: matching (H, W, 1) / (N, H, W, 1) {0,1} float.
    Returns float32 output of the same leading shape, equal to
    `nonlin(conv3x3(pad(x), w, b)) * out_mask`.

    interpret=None resolves to 'not on TPU' (CPU tests run the Pallas
    interpreter).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
        out_mask = out_mask[None]
    out = _conv3x3_tile_sparse(x, w, b, out_mask, pad_mode, nonlin, th,
                               interpret, flat_dots)
    return out[0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("pad_mode", "nonlin", "th",
                                             "interpret", "flat_dots"))
def _conv3x3_tile_sparse(x: Array, w: Array, b: Array, out_mask: Array,
                         pad_mode: str = "reflect",
                         nonlin: Optional[Callable] = None,
                         th: int = 8, interpret: bool = False,
                         flat_dots: bool = False) -> Array:
    n, h, w_img, cin = x.shape
    cout = w.shape[-1]
    hp = -(-h // th) * th

    cpad = (-(-cin // 128) * 128) if not interpret else cin
    wpad = (-(-(w_img + 2) // 8) * 8) if not interpret else (w_img + 2)

    xp = pad2d(x, 1, pad_mode)                        # (N, H+2, W+2, C)
    xp = jnp.pad(xp, ((0, 0), (0, hp - h), (0, wpad - (w_img + 2)),
                      (0, cpad - cin)))               # (N, Hp+2, Wp, Cp)
    maskp = jnp.pad(out_mask, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    flags = stripe_flags(out_mask, th)

    n_h = hp // th
    wk = jnp.pad(w, ((0, 0), (0, 0), (0, cpad - cin), (0, 0))
                 ).reshape(9, cpad, cout)
    bk = b.reshape(1, 1, cout)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, n_h),
        in_specs=[
            # stays in HBM: inactive stripes never DMA their window, and
            # VMEM-resident inputs can't be sliced at runtime by Mosaic
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),       # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bias
            pl.BlockSpec((1, th, w_img, 1),
                         lambda nn_, i, *_: (nn_, i, 0, 0),
                         memory_space=pltpu.VMEM),       # out mask
        ],
        out_specs=pl.BlockSpec((1, th, w_img, cout),
                               lambda nn_, i, *_: (nn_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wpad, cpad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    kernel = functools.partial(_conv_kernel, nonlin, th, w_img, cpad,
                               cout, n_h, flat_dots)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, hp, w_img, cout), jnp.float32),
        interpret=interpret,
    )(flags, xp, wk, bk, maskp)
    return out[:, :h]


# ---------------------------------------------------------------------------
# 2-D tile-sparse variant: finer skip granularity than row stripes.
#
# Mosaic can only runtime-slice leading memref dims, so the caller
# re-tiles the padded image into (N, nTiles, TH+2, TWp, Cp) — one XLA
# materialization, halo included — and the kernel DMAs tile t of image n
# with pure leading-dim indexing. Per-tile flags then skip at (TH, TW)
# granularity, which matches spatially clustered wavelet masks far better
# than full-width stripes.
# ---------------------------------------------------------------------------

def _conv_kernel_2d(nonlin, th, tw, cin, cout, n_tiles, flat_dots,
                    flags_ref, tiles_ref, w_ref, b_ref, mask_ref,
                    out_ref, xs_ref, sem):
    n = pl.program_id(0)
    t = pl.program_id(1)
    flag = flags_ref[n * n_tiles + t]

    @pl.when(flag > 0)
    def _active():
        dma = pltpu.make_async_copy(tiles_ref.at[n, t], xs_ref, sem)
        dma.start()
        dma.wait()
        acc = jnp.zeros((th, tw, cout), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                patch = xs_ref[ky:ky + th, kx:kx + tw, :]
                acc = acc + jax.lax.dot_general(
                    patch, w_ref[ky * 3 + kx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        y = acc + b_ref[0, 0]
        if nonlin is not None:
            y = nonlin(y)
        out_ref[...] = y * mask_ref[...]

    @pl.when(flag == 0)
    def _inactive():
        out_ref[...] = jnp.zeros_like(out_ref)


def _tile_image(xp: Array, n_h: int, n_w: int, th: int, tw: int,
                twp: int) -> Array:
    """(N, Hp+2, Wx, C) padded image -> (N, nT, th+2, twp, C) halo tiles
    (static slice stack; one XLA materialization)."""
    tiles = []
    for ih in range(n_h):
        for iw in range(n_w):
            t = xp[:, ih * th:ih * th + th + 2, iw * tw:iw * tw + twp, :]
            tiles.append(t)
    return jnp.stack(tiles, axis=1)


def tile_flags_2d(out_mask: Array, th: int, tw: int) -> Array:
    """Per-image 2-D tile flags from (N, H, W, 1). Returns (N * nT,)."""
    n, h, w = out_mask.shape[0], out_mask.shape[1], out_mask.shape[2]
    hp, wp = -(-h // th) * th, -(-w // tw) * tw
    m = jnp.pad(out_mask[..., 0], ((0, 0), (0, hp - h), (0, wp - w)))
    m = m.reshape(n, hp // th, th, wp // tw, tw)
    return (jnp.max(m, axis=(2, 4)) > 0).astype(jnp.int32).reshape(-1)


def conv3x3_tile_sparse_2d(x: Array, w: Array, b: Array, out_mask: Array,
                           pad_mode: str = "reflect",
                           nonlin: Optional[Callable] = None,
                           th: int = 8, tw: int = 64,
                           interpret: Optional[bool] = None) -> Array:
    """Masked 3x3 conv with 2-D (th x tw) tile skipping. Same contract as
    conv3x3_tile_sparse."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
        out_mask = out_mask[None]
    out = _conv3x3_tile_sparse_2d(x, w, b, out_mask, pad_mode, nonlin,
                                  th, tw, interpret)
    return out[0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("pad_mode", "nonlin", "th",
                                             "tw", "interpret"))
def _conv3x3_tile_sparse_2d(x: Array, w: Array, b: Array,
                            out_mask: Array, pad_mode: str,
                            nonlin: Optional[Callable], th: int, tw: int,
                            interpret: bool) -> Array:
    n, h, w_img, cin = x.shape
    cout = w.shape[-1]
    hp = -(-h // th) * th
    wp = -(-w_img // tw) * tw
    n_h, n_w = hp // th, wp // tw
    n_tiles = n_h * n_w

    cpad = (-(-cin // 128) * 128) if not interpret else cin
    # tile sublane dim (tw + 2 halo) padded to a multiple of 8
    twp = (-(-(tw + 2) // 8) * 8) if not interpret else (tw + 2)

    xp = pad2d(x, 1, pad_mode)                       # (N, H+2, W+2, C)
    xp = jnp.pad(xp, ((0, 0), (0, hp - h),
                      (0, wp + twp - tw - (w_img + 2)),
                      (0, cpad - cin)))
    tiles = _tile_image(xp, n_h, n_w, th, tw, twp)   # (N,nT,th+2,twp,Cp)
    flags = tile_flags_2d(out_mask, th, tw)

    maskp = jnp.pad(out_mask, ((0, 0), (0, hp - h), (0, wp - w_img),
                               (0, 0)))
    maskt = maskp.reshape(n, n_h, th, n_w, tw, 1).transpose(
        0, 1, 3, 2, 4, 5).reshape(n, n_tiles, th, tw, 1)

    wk = jnp.pad(w, ((0, 0), (0, 0), (0, cpad - cin), (0, 0))
                 ).reshape(9, cpad, cout)
    bk = b.reshape(1, 1, cout)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),        # halo tiles
            pl.BlockSpec(memory_space=pltpu.VMEM),       # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bias
            pl.BlockSpec((1, 1, th, tw, 1),
                         lambda nn_, t, *_: (nn_, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),       # out mask tiles
        ],
        out_specs=pl.BlockSpec((1, 1, th, tw, cout),
                               lambda nn_, t, *_: (nn_, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th + 2, twp, cpad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    kernel = functools.partial(_conv_kernel_2d, nonlin, th, tw, cpad,
                               cout, n_tiles, False)
    out_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, n_tiles, th, tw, cout),
                                       jnp.float32),
        interpret=interpret,
    )(flags, tiles, wk, bk, maskt)
    out = out_t.reshape(n, n_h, n_w, th, tw, cout).transpose(
        0, 1, 3, 2, 4, 5).reshape(n, hp, wp, cout)
    return out[:, :h, :w_img]

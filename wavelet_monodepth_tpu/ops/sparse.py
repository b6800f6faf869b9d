"""Static-shape sparse-conv engine: thresholded wavelet masks + masked
dense compute, with the reference's analytic op counters.

The reference implements sparsity with data-dependent gather/scatter
(`KITTI/layers.py:337-508`, `NYUv2/networks/layers.py:82-223`):
mask -> index map -> 9-way shifted gather (im2col of active sites) -> GEMM
-> scatter, where inactive neighbours contribute *zero* (the index map is
shifted by one and index 0 reads a zero slot, `KITTI/layers.py:439-441`).

That formulation is impossible under XLA's static shapes, and per-pixel
gather/scatter is a poor fit for the TPU's (8,128) vector tiles anyway.
Key identity used here instead: because inactive inputs contribute zero,

    sparse_conv(x at in_mask) scattered to out_mask
        == nonlin(conv(pad(x * in_mask))) * out_mask

exactly (not approximately): masking the input reproduces the zero-fill
gather; masking the output reproduces the scatter. All shapes stay static,
results are bit-equal to the reference's engine, and the mask structure is
exposed to the tile-skipping Pallas kernels (`ops/pallas_sparse.py`) which
turn it into wall-clock savings.

Analytic op counters reproduce the reference's FLOP accounting
(`depth_decoder.py:246-266,299-427`) so the score-vs-FLOPs curve is
comparable; counts are jnp scalars (mask populations are data-dependent).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .convops import conv1x1, conv3x3
from .image import dilate_mask, upsample_nearest2x

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# Mask construction (threshold + dilation), `depth_decoder.py:305-323`.
# ---------------------------------------------------------------------------

def wavelet_threshold_mask(yl: Array, yh: Array,
                           thresh_ratio: float | Array) -> Array:
    """Coefficient mask: |yh| max over bands > (yl.max - yl.min) * ratio.

    Args:
      yl: (N, H', W', 1) low-pass at any resolution (only min/max used).
      yh: (N, H, W, 3) high-frequency bands at the mask resolution.
    Returns:
      float {0,1} mask (N, H, W, 1). `depth_decoder.py:308-309`.

    The threshold is per-image (max/min over each sample). The reference
    only supports batch 1, where this is identical to its global max/min;
    per-image extends sparse decoding to batched inference.
    """
    thresh = (jnp.max(yl, axis=(1, 2, 3), keepdims=True)
              - jnp.min(yl, axis=(1, 2, 3), keepdims=True)) * thresh_ratio
    return (jnp.max(jnp.abs(yh), axis=-1, keepdims=True) > thresh
            ).astype(yl.dtype)


def stage_masks(mask: Array) -> dict[str, Array]:
    """Dilated per-op masks for one sparse decoder scale
    (`depth_decoder.py:313-319`).

    Returns masks keyed: lowres (3x3 dilation, low res), upconv0 (5x5, low
    res), upsample (5x5 of upsampled, high res), upconv1 (3x3 of upsampled,
    high res), wavelet (upsampled mask itself, high res).
    """
    umask = upsample_nearest2x(mask)
    return {
        "lowres": dilate_mask(mask, 3),
        "upconv0": dilate_mask(mask, 5),
        "upsample": dilate_mask(umask, 5),
        "upconv1": dilate_mask(umask, 3),
        "wavelet": umask,
    }


# ---------------------------------------------------------------------------
# Masked dense compute (bit-equal to the gather/scatter engine).
# ---------------------------------------------------------------------------

def masked_conv3x3(x: Array, w: Array, b: Array, in_mask: Array | None,
                   out_mask: Array | None, pad_mode: str = "reflect",
                   nonlin: Callable[[Array], Array] | None = None) -> Array:
    """`sparse_conv3x3` equivalent (`KITTI/layers.py:409-480`)."""
    if in_mask is not None:
        x = x * in_mask
    y = conv3x3(x, w, b, pad_mode)
    if nonlin is not None:
        y = nonlin(y)
    if out_mask is not None:
        y = y * out_mask
    return y


def masked_waveconv(x: Array, w1: Array, b1: Array, w3: Array, b3: Array,
                    in_mask: Array | None, out_mask: Array | None,
                    pad_mode: str = "reflect",
                    final_nonlin: Callable[[Array], Array] = jax.nn.sigmoid
                    ) -> Array:
    """Sequential(Conv1x1, LeakyReLU(0.1), Conv3x3) under masks — the
    `waveconv` heads (`depth_decoder.py:111-120`), sparse dispatch at
    `KITTI/layers.py:426-431`. The intermediate is re-masked because the
    reference's conv1x1 only exists at active sites (bias leaks otherwise).
    """
    if in_mask is not None:
        x = x * in_mask
    h = jax.nn.leaky_relu(conv1x1(x, w1, b1), negative_slope=0.1)
    if in_mask is not None:
        h = h * in_mask
    y = final_nonlin(conv3x3(h, w3, b3, pad_mode))
    if out_mask is not None:
        y = y * out_mask
    return y


def masked_upsample_concat(x: Array, skip: Array,
                           out_mask: Array | None) -> Array:
    """`sparse_upsample` equivalent (`KITTI/layers.py:483-508`): nearest-x2
    the (already masked) features, concat the skip, mask the result."""
    y = jnp.concatenate([upsample_nearest2x(x), skip], axis=-1)
    if out_mask is not None:
        y = y * out_mask
    return y


def compute_density(outputs: dict, per_image: bool = False) -> Array:
    """Fraction of active wavelet coefficients across scales
    (`evaluate_depth.py:37-47`). Expects ("wavelet_mask", i) NHWC entries.
    per_image=True returns an (N,) vector instead of the batch mean."""
    num = 0.0
    den = 0.0
    for i in range(4):
        k = ("wavelet_mask", i)
        if k in outputs:
            # f32 accumulation: a bf16 mask summed in its own dtype
            # rounds the integer count (density > 1 artifacts)
            m = outputs[k].astype(jnp.float32)
            if per_image:
                num = num + jnp.sum(m, axis=(1, 2, 3))
                den = den + m.shape[1] * m.shape[2]
            else:
                num = num + jnp.sum(m)
                den = den + m.shape[0] * m.shape[1] * m.shape[2]
    if den == 0.0:
        raise ValueError("compute_density: no (\"wavelet_mask\", i) "
                         "entries in outputs — dense-decoder outputs "
                         "have no density (run with thresh_ratio set)")
    return num / den


# ---------------------------------------------------------------------------
# Analytic op counters — the reference's accounting, reproduced exactly.
# ---------------------------------------------------------------------------

def ops_mask2idxmap(mask: Array) -> Array:
    """`mask2idxmap` cost (`KITTI/layers.py:388`): H*W of the mask."""
    return jnp.asarray(mask.shape[1] * mask.shape[2], jnp.float32)


def ops_threshold(mask: Array) -> Array:
    """Threshold compare cost (`depth_decoder.py:310`): 3*H*W."""
    return jnp.asarray(3 * mask.shape[1] * mask.shape[2], jnp.float32)


def ops_dilation(mask: Array) -> Array:
    """Maxpool dilation cost (`depth_decoder.py:322-323`)."""
    hw = mask.shape[1] * mask.shape[2]
    return jnp.asarray(25 * hw + 25 * 4 * hw, jnp.float32)


def ops_sparse_conv3x3(n_out: Array, ichn: int, ochn: int) -> Array:
    """Gather + GEMM cost (`KITTI/layers.py:462,469`): 9*ichn gathers per
    output site plus (1 + 9*ichn)*ochn MACs per output site."""
    n_out = n_out.astype(jnp.float32)
    return 9.0 * ichn * n_out + (1.0 + 9.0 * ichn) * n_out * ochn


def ops_sparse_conv1x1(n_in: Array, ichn: int, ochn: int) -> Array:
    """`sparse_conv1x1` cost (`KITTI/layers.py:405`)."""
    n_in = n_in.astype(jnp.float32)
    return n_in * ichn * ochn + n_in * ochn


def ops_dense_conv3x3(x_shape, ochn: int) -> Array:
    """Dense 3x3 conv cost as the reference counts it
    (`depth_decoder.py:386-387`): (1 + 9*C*H*W) * ochn, NHWC shape."""
    _, h, w, c = x_shape
    return jnp.asarray((1.0 + 9.0 * c * h * w) * ochn, jnp.float32)


def ops_dense_conv3x3_nyu(x_shape, ochn: int) -> Array:
    """Dense 3x3 conv cost as the NYU tree counts it
    (`densedepth_decoder.py:352-353`): (1 + 9*C) * H * W * ochn — the
    NYU reference counts the bias per output site, the KITTI reference
    (`depth_decoder.py:386-387`) once per tensor. NHWC shape."""
    _, h, w, c = x_shape
    return jnp.asarray((1.0 + 9.0 * c) * h * w * ochn, jnp.float32)


def ops_dense_conv1x1(x_shape, ichn: int, ochn: int) -> Array:
    """Dense 1x1 conv cost (`depth_decoder.py:248-250`)."""
    _, h, w, _ = x_shape
    return jnp.asarray((1.0 + ichn * h * w) * ochn, jnp.float32)


def ops_idwt(yl_shape) -> Array:
    """IDWT cost (`depth_decoder.py:373`): 4*H*W of the output."""
    _, h, w, _ = yl_shape
    return jnp.asarray(4.0 * h * w, jnp.float32)


def mask_count(mask: Array) -> Array:
    """Active sites per image, shape (N,) — makes every op count
    per-image so batched sparse decode accounts like N reference
    batch-1 runs (the reference is batch-1 only, `depth_decoder.py:297`).
    Accumulates in f32: summing a bf16 mask in its own dtype loses
    integer exactness past 256 sites (~0.5% count error at 245k)."""
    return jnp.sum(mask.astype(jnp.float32), axis=(1, 2, 3))

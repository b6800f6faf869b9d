"""Image-space primitives (NHWC): padding, nearest upsampling, mask
dilation, bilinear resize/warp, smoothness loss.

These are the TPU-native equivalents of the reference's L1 ops
(`KITTI/layers.py:233-252`, `NYUv2/networks/layers.py:35-36`, the maxpool
dilations in `depth_decoder.py:313-319`) and of `F.interpolate` /
`F.grid_sample` call sites (`trainer.py:338,371`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PAD_MODES = {"reflect": "reflect", "zero": "constant", "replicate": "edge"}


def pad2d(x: jnp.ndarray, pad: int = 1, mode: str = "reflect") -> jnp.ndarray:
    """Spatial padding of an NHWC tensor.

    mode: 'reflect' (torch ReflectionPad2d), 'zero' (ZeroPad2d),
    'replicate' (ReplicationPad2d).  Reference: `KITTI/layers.py:146-161`,
    `NYUv2/networks/layers.py:14-27`.
    """
    jmode = _PAD_MODES[mode]
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=jmode)


def upsample_nearest2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour x2 upsampling (`KITTI/layers.py:233-236`)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def _interp_matrix_ac(out_n: int, in_n: int, dtype) -> jnp.ndarray:
    """(out_n, in_n) corner-aligned 1-D linear interpolation matrix
    (static; 2 nonzeros per row)."""
    import numpy as np
    pos = (np.linspace(0.0, in_n - 1.0, out_n) if out_n > 1
           else np.zeros((1,)))
    i0 = np.minimum(np.floor(pos).astype(np.int64), in_n - 1)
    i1 = np.minimum(i0 + 1, in_n - 1)
    f = pos - i0
    m = np.zeros((out_n, in_n), np.float64)
    np.add.at(m, (np.arange(out_n), i0), 1.0 - f)
    np.add.at(m, (np.arange(out_n), i1), f)
    return jnp.asarray(m, dtype)


def resize_bilinear(x: jnp.ndarray, height: int, width: int,
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize matching torch F.interpolate(mode='bilinear').

    align_corners=False is torch's (and jax.image 'linear') half-pixel
    convention; align_corners=True samples corner-aligned grids.
    """
    if align_corners:
        # the grid is static and separable -> two small matmuls with
        # constant 2-sparse interpolation matrices (MXU work) instead of
        # a per-pixel gather (descriptor-rate-bound on TPU, see
        # _bilinear_gather). Exactly bilinear: separable kernels.
        n, h, w, c = x.shape
        my = _interp_matrix_ac(height, h, x.dtype)
        mx = _interp_matrix_ac(width, w, x.dtype)
        t = jnp.einsum("oh,nhwc->nowc", my, x)
        return jnp.einsum("pw,nowc->nopc", mx, t)
    return jax.image.resize(x, (x.shape[0], height, width, x.shape[3]),
                            method="linear")


def max_pool_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k x k max pool, stride 1, SAME padding (torch MaxPool2d(k, 1, k//2)).

    Used for mask dilation in the sparse decoders
    (`depth_decoder.py:221-223,313-319`).  Pads with -inf so zero masks
    stay zero at borders.
    """
    p = k // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
        [(0, 0), (p, p), (p, p), (0, 0)])


def dilate_mask(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Dilate a {0,1} float mask with a k x k window."""
    return max_pool_same(mask, k)


def avg_pool3_valid(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 average pool, stride 1, VALID (torch AvgPool2d(3, 1)) — the SSIM
    building block (`KITTI/layers.py:286-290`)."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), "VALID")
    return s / 9.0


# XLA's TPU gather degrades superlinearly with flat-operand size: vs
# the ~24-35 MB sweet spot, a 71 MB operand is 1.5x slower per byte and
# 94 MB is 6.5x (PERF.md "gather cliff"; tools_dev/
# gather_cliff_experiment.py). Splitting the take along batch so each
# operand stays in the sweet spot restores full speed; going much
# smaller also loses (11.8 MB takes were 2.7x slower than 35 MB ones),
# so sub-threshold operands stay on the proven single-take path.
_TAKE_OPERAND_MAX_BYTES = 36 * 1024 * 1024


def _bilinear_gather(img: jnp.ndarray, y: jnp.ndarray,
                     x: jnp.ndarray, batch_shards: int = 1) -> jnp.ndarray:
    """Gather img (N,H,W,C) at float pixel coords y/x (N,Ho,Wo) with border
    clamping (grid_sample padding_mode='border').

    ONE gather, not four: the four bilinear corners are pre-stacked into
    channels (img, shift-left, shift-up, shift-up-left with edge clamp,
    so (x0, x0+1 clamped) == (x0 of img, x0 of the shifted copy)), and a
    single take_along_axis fetches 4C-wide rows. Per-pixel gathers are
    descriptor-rate-bound on TPU (device-traced: the 4-gather form was
    82% of the whole KITTI train step; see PERF.md "warp gathers"), so
    4x fewer descriptors at 4x the row width is a direct win. The
    shifted copies are three cheap elementwise passes.

    batch_shards: data-parallel shard count of the batch axis (1 =
    unsharded). The anti-cliff chunking below sizes takes by PER-SHARD
    operand bytes and keeps chunk boundaries inside shards — a chunk
    that straddles shard boundaries makes GSPMD replicate the operand
    ("involuntary full rematerialization",
    tests/test_warp.py::test_chunked_take_under_data_mesh)."""
    n, h, w, c = img.shape
    out_dt = jnp.promote_types(img.dtype, y.dtype)
    # index/weight math pinned to f32: bf16 can't represent integer
    # pixel coords > 256 (e.g. clip(x, 0, 639) rounds 639 -> 640 in
    # bf16, sending the take out of bounds), and casting y0 to a bf16
    # img dtype corrupted the bilinear weights. No-ops on the f32 path.
    y = jnp.clip(y.astype(jnp.float32), 0.0, h - 1.0)
    x = jnp.clip(x.astype(jnp.float32), 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    wy = (y - y0.astype(jnp.float32))[..., None]
    wx = (x - x0.astype(jnp.float32))[..., None]

    right = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
    down = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    downright = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
    cat = jnp.concatenate([img, right, down, downright], axis=-1)

    # flat axis-0 take beats batched take_along_axis by ~1.3x at this
    # shape (tools_dev/warp_gather_experiment.py); batch-chunked above
    # the operand cliff (tools_dev/gather_cliff_experiment.py)
    shards = batch_shards if (batch_shards > 1
                              and n % batch_shards == 0) else 1
    local_n = n // shards
    per_img_bytes = h * w * 4 * c * cat.dtype.itemsize
    budget = max(1, min(local_n, _TAKE_OPERAND_MAX_BYTES // max(
        per_img_bytes, 1)))
    # EQUAL chunks only, so the parts can be jnp.stack-ed: on the TPU
    # backend, jnp.concatenate of per-chunk takes under jax.grad
    # miscompiles — the fused fwd+bwd program corrupts the tail of the
    # last chunk's forward VALUE (128 non-finite lanes at b12 640x192;
    # tools_dev/warp_chunk_nan_experiment.py is the minimal repro; CPU
    # and the forward-only program are exact). stack+reshape of equal
    # chunks lowers to a different program that matches the single-take
    # result bit-for-bit, so chunk size = largest divisor of local_n
    # within the operand budget (worst case 1, i.e. per-image takes).
    imgs_per_take = next(k for k in range(budget, 0, -1)
                         if local_n % k == 0)
    if imgs_per_take >= local_n:
        # single take per shard == the original single flat take (the
        # per-device operand is below the cliff)
        flat = cat.reshape(n * h * w, 4 * c)
        gidx = (jnp.arange(n, dtype=jnp.int32)[:, None, None] * (h * w)
                + y0 * w + x0).reshape(-1)
        v = jnp.take(flat, gidx, axis=0).reshape(y0.shape + (4, c))
    elif shards == 1:
        parts = []
        for s in range(0, n, imgs_per_take):
            e = s + imgs_per_take
            flat = cat[s:e].reshape(imgs_per_take * h * w, 4 * c)
            gidx = (jnp.arange(imgs_per_take,
                               dtype=jnp.int32)[:, None, None]
                    * (h * w) + y0[s:e] * w + x0[s:e]).reshape(-1)
            parts.append(jnp.take(flat, gidx, axis=0))
        v = jnp.stack(parts, axis=0).reshape(y0.shape + (4, c))
    else:
        # shard-aware chunking: view the batch as (shards, local_n) and
        # slice the UNSHARDED local axis, so every chunk holds the same
        # k images from every shard — balanced and communication-free
        # under a 'data'-sharded batch
        ho, wo = y0.shape[1], y0.shape[2]
        catv = cat.reshape(shards, local_n, h, w, 4 * c)
        y0v = y0.reshape(shards, local_n, ho, wo)
        x0v = x0.reshape(shards, local_n, ho, wo)
        parts = []
        k = imgs_per_take
        for s in range(0, local_n, k):
            e = s + k
            flat = catv[:, s:e].reshape(shards * k * h * w, 4 * c)
            gidx = (jnp.arange(shards * k,
                               dtype=jnp.int32)[:, None, None] * (h * w)
                    + (y0v[:, s:e] * w
                       + x0v[:, s:e]).reshape(shards * k, ho, wo)
                    ).reshape(-1)
            parts.append(jnp.take(flat, gidx, axis=0)
                         .reshape(shards, k, ho, wo, 4 * c))
        v = jnp.stack(parts, axis=1).reshape(y0.shape + (4, c))
    v00, v01, v10, v11 = (v[..., 0, :], v[..., 1, :],
                          v[..., 2, :], v[..., 3, :])
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).astype(out_dt)


def grid_sample_border(img: jnp.ndarray, grid: jnp.ndarray,
                       batch_shards: int = 1) -> jnp.ndarray:
    """torch F.grid_sample(img, grid, padding_mode='border',
    align_corners=False) equivalent, NHWC.

    Args:
      img:  (N, H, W, C).
      grid: (N, Ho, Wo, 2) normalized coords in [-1, 1], last dim (x, y).
      batch_shards: data-parallel shard count of the batch axis (see
        _bilinear_gather; pass opts.data_axis when the batch is sharded
        over a mesh so anti-cliff chunking stays shard-aligned).
    Reference call site: `KITTI/trainer.py:371-374`.

    Torch's align_corners=False maps u in [-1,1] to pixel centres via
    ((u + 1) * size - 1) / 2; out-of-range coords clamp to the border.
    """
    n, h, w, c = img.shape
    u = grid[..., 0]
    v = grid[..., 1]
    x = ((u + 1.0) * w - 1.0) * 0.5
    y = ((v + 1.0) * h - 1.0) * 0.5
    return _bilinear_gather(img, y, x, batch_shards=batch_shards)


def get_smooth_loss(disp: jnp.ndarray, img: jnp.ndarray,
                    gamma: float = 2.0) -> jnp.ndarray:
    """Edge-aware disparity smoothness (`KITTI/layers.py:239-252`). NHWC."""
    grad_disp_x = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    grad_disp_y = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])
    grad_img_x = jnp.mean(jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]),
                          axis=3, keepdims=True)
    grad_img_y = jnp.mean(jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]),
                          axis=3, keepdims=True)
    grad_disp_x = grad_disp_x * jnp.exp(-gamma * grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-gamma * grad_img_y)
    return jnp.mean(grad_disp_x) + jnp.mean(grad_disp_y)


def get_grad_map(img: jnp.ndarray, reduce: bool = False) -> jnp.ndarray:
    """Per-channel |dx|/|dy| gradient maps, reflect-padded back to input
    size (`KITTI/layers.py:255-278`). NHWC; returns channels stacked
    [grad_x..., grad_y...] (2C, or 2 with reduce=True)."""
    gx = jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :])
    gy = jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :])
    gx = jnp.pad(gx, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="reflect")
    gy = jnp.pad(gy, ((0, 0), (0, 1), (0, 0), (0, 0)), mode="reflect")
    if reduce:
        gx = jnp.mean(gx, axis=3, keepdims=True)
        gy = jnp.mean(gy, axis=3, keepdims=True)
    return jnp.concatenate([gx, gy], axis=3)


def normalize_image(x: jnp.ndarray) -> jnp.ndarray:
    """Rescale to [0, 1] for visualization (`KITTI/utils.py:24-29`)."""
    ma, mi = jnp.max(x), jnp.min(x)
    return (x - mi) / (ma - mi + 1e-5)

"""Flax building-block modules shared by all decoders (KITTI + NYU trees —
the reference duplicates these, `KITTI/layers.py:120-173` vs
`NYUv2/networks/layers.py:11-67`; here there is ONE copy).

Every module optionally takes `in_mask` / `out_mask` so the same params
drive both the dense decoders and the masked-sparse inference path (see
ops/sparse.py for why masking is bit-equal to the reference's
gather/scatter engine). Masks are `None` for dense compute and XLA sees
exactly the dense program in that case.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import convops
from ..ops.image import upsample_nearest2x

Array = jnp.ndarray


def _torch_conv_init(key, shape, dtype=jnp.float32):
    """Kaiming-uniform fan-in init matching torch nn.Conv2d defaults, so
    scratch training behaves like the reference. shape is HWIO."""
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    bound = (1.0 / fan_in) ** 0.5 * (6.0 ** 0.5) / (2.0 ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (fan_in ** 0.5)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class Conv3x3(nn.Module):
    """Pad-then-conv 3x3 (`KITTI/layers.py:146-161`).

    `use_pallas` selects the sparse execution backend when an out_mask
    is present: False/"xla" = masked dense (oracle), True/"pallas" =
    row-stripe tile-skip kernel, "pallas2d" = 2-D tile-skip kernel,
    "capacity" = pure-XLA top-K tile compaction (ops/capacity.py). All
    are verified against the oracle; see PERF.md for trade-offs.
    """
    features: int
    pad_mode: str = "reflect"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, in_mask: Optional[Array] = None,
                 out_mask: Optional[Array] = None,
                 nonlin: Optional[Callable[[Array], Array]] = None,
                 use_pallas: bool = False,
                 capacity_ratio: float = 0.5) -> Array:
        cin = x.shape[-1]
        w = self.param("kernel", _torch_conv_init, (3, 3, cin, self.features))
        b = (self.param("bias", _torch_bias_init(9 * cin), (self.features,))
             if self.use_bias else None)
        if in_mask is not None:
            x = x * in_mask
        backend = use_pallas if isinstance(use_pallas, str) else (
            "pallas" if use_pallas else "xla")
        if backend != "xla" and out_mask is not None:
            bz = b if b is not None else jnp.zeros((self.features,),
                                                   x.dtype)
            if backend == "capacity":
                from ..ops import capacity as cap
                return cap.conv3x3_capacity_sparse(
                    x, w, bz, out_mask, self.pad_mode, nonlin,
                    capacity_ratio=capacity_ratio)
            from ..ops import pallas_conv as pc
            pnonlin = {jax.nn.elu: pc.elu,
                       jax.nn.sigmoid: pc.sigmoid}.get(nonlin, nonlin)
            if backend == "pallas2d":
                return pc.conv3x3_tile_sparse_2d(x, w, bz, out_mask,
                                                 self.pad_mode, pnonlin)
            return pc.conv3x3_tile_sparse(x, w, bz, out_mask,
                                          self.pad_mode, pnonlin)
        y = convops.conv3x3(x, w, b, self.pad_mode)
        if nonlin is not None:
            y = nonlin(y)
        if out_mask is not None:
            y = y * out_mask
        return y


class Conv1x1(nn.Module):
    """Pointwise conv (`KITTI/layers.py:164-173`)."""
    features: int

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        cin = x.shape[-1]
        w = self.param("kernel", _torch_conv_init, (1, 1, cin, self.features))
        b = self.param("bias", _torch_bias_init(cin), (self.features,))
        y = convops.conv1x1(x, w, b)
        if mask is not None:
            y = y * mask
        return y


class ConvBlock(nn.Module):
    """Conv3x3 + ELU (`KITTI/layers.py:120-143`)."""
    features: int
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x: Array, in_mask: Optional[Array] = None,
                 out_mask: Optional[Array] = None,
                 use_pallas: bool = False,
                 capacity_ratio: float = 0.5) -> Array:
        return Conv3x3(self.features, self.pad_mode, name="conv")(
            x, in_mask, out_mask, nonlin=jax.nn.elu,
            use_pallas=use_pallas, capacity_ratio=capacity_ratio)


class WaveConv(nn.Module):
    """Sequential(Conv1x1, LeakyReLU(0.1), Conv3x3-reflect) coefficient
    head (`depth_decoder.py:106-120`). The intermediate is re-masked under
    sparsity (see ops/sparse.py masked_waveconv)."""
    mid_features: int
    out_features: int

    @nn.compact
    def __call__(self, x: Array, in_mask: Optional[Array] = None,
                 out_mask: Optional[Array] = None,
                 final_nonlin: Optional[Callable[[Array], Array]]
                 = jax.nn.sigmoid, use_pallas: bool = False,
                 capacity_ratio: float = 0.5) -> Array:
        if in_mask is not None:
            x = x * in_mask
        h = Conv1x1(self.mid_features, name="squeeze")(x)
        h = jax.nn.leaky_relu(h, negative_slope=0.1)
        if in_mask is not None:
            h = h * in_mask
        if use_pallas and out_mask is not None:
            return Conv3x3(self.out_features, "reflect", name="conv")(
                h, None, out_mask, nonlin=final_nonlin,
                use_pallas=use_pallas, capacity_ratio=capacity_ratio)
        y = Conv3x3(self.out_features, "reflect", name="conv")(h)
        if final_nonlin is not None:
            y = final_nonlin(y)
        if out_mask is not None:
            y = y * out_mask
        return y


def upsample_concat(x: Array, skip: Optional[Array],
                    out_mask: Optional[Array] = None) -> Array:
    """Nearest-x2 + optional skip concat (+ mask), the KITTI decoder's
    in-between step (`depth_decoder.py:146-149`, sparse variant
    `KITTI/layers.py:483-508`)."""
    y = upsample_nearest2x(x)
    if skip is not None:
        y = jnp.concatenate([y, skip], axis=-1)
    if out_mask is not None:
        y = y * out_mask
    return y

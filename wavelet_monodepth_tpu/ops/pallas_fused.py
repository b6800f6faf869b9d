"""Fused per-scale sparse wavelet-decoder stage as ONE Pallas kernel.

Motivation (PERF.md): per-conv Pallas invocation loses to XLA because
every call pays pad/tile materializations larger than the conv itself.
This kernel keeps one decoder scale entirely in VMEM per tile:

    upconv0 (3x3+ELU, low res) -> nearest-x2 upsample -> +skip (concat
    expressed as split-weight sum: conv(concat(a,b)) = conv_a(a) +
    conv_b(b)) -> upconv1 (3x3+ELU) -> pos/neg waveconv heads
    (1x1+LeakyReLU(0.1)+3x3+sigmoid) -> yh -> Haar IDWT butterfly

with the stage's dilated masks applied exactly as the masked-dense
oracle does (ops/sparse.py), and inactive tiles short-circuiting to the
yl-only butterfly. Inputs arrive pre-tiled (one XLA materialization per
tensor; x and skip are pre-masked with their input masks in XLA);
outputs are tile stacks the caller re-interleaves.

Tile geometry (high-res tile HT x WT, low-res tile HT/2 x WT/2;
default (8, 64) — larger tiles exceed the 16MB scoped VMEM):
  x      low-res, halo 2, pre-masked by lowres mask
  skip   high-res, halo 2, pre-masked by upsample mask
  masks passed as 2-D tile planes: upconv0 (lo, halo 1), upsample
         (hi, halo 2), upconv1 (hi, halo 1), wavelet (hi)
  yl     high-res (HT, WT)
Outputs per tile: yh (3, HT, WT), IDWT phase planes (4, HT, WT)
(caller interleaves to 2HT x 2WT), and x1 (HT, WT, Cd) for the next
scale.

Exactness: interior pixels (and all interior tile seams) match the
oracle; a <=2px IMAGE-border ring differs because the oracle
reflect-pads intermediate features while this kernel reflect-pads
inputs. Status: correct but slower than the XLA oracle at this model
scale (PERF.md) — kept as the round-2 optimization substrate.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .image import pad2d
from .pallas_conv import elu, leaky_relu_01, sigmoid

Array = jnp.ndarray


def _conv3x3_sum(x: Array, w9: Array, rows: int, cols: int,
                 flat: bool = True) -> Array:
    """Valid 3x3 conv via 9 channel-contraction dots.
    x: (rows+2, >=cols+2, Cin); w9: (9, Cin, Cout). flat=True folds the
    spatial dims into one big-M GEMM per shift (better MXU utilization
    for small tiles)."""
    cin = x.shape[-1]
    cout = w9.shape[-1]
    if flat:
        acc = jnp.zeros((rows * cols, cout), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                patch = x[ky:ky + rows, kx:kx + cols, :]
                acc = acc + jnp.dot(patch.reshape(rows * cols, cin),
                                    w9[ky * 3 + kx],
                                    preferred_element_type=jnp.float32)
        return acc.reshape(rows, cols, cout)
    acc = jnp.zeros((rows, cols, cout), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            patch = x[ky:ky + rows, kx:kx + cols, :]
            acc = acc + jax.lax.dot_general(
                patch, w9[ky * 3 + kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc


def _up2(x: Array, rows: int, cols: int) -> Array:
    """Nearest-x2 upsample of (rows, cols, C) -> (2*rows, 2*cols, C).
    Gather-free (jnp.repeat lowers to an unsupported in-kernel gather):
    broadcast + reshape interleaves instead."""
    r, c, ch = x.shape
    x = jnp.broadcast_to(x[:, None, :, :], (r, 2, c, ch)).reshape(
        2 * r, c, ch)
    x = jnp.broadcast_to(x[:, :, None, :], (2 * r, c, 2, ch)).reshape(
        2 * r, 2 * c, ch)
    return x


def _fused_kernel(i_scale, hl, wl, wlp, ht, wt, wtp, cx, cs, cd,
                  flags_ref, xt, st, ylt, m_u0, m_up, m_u1, m_wv,
                  w0, b0, w1x, w1s, b1, wp1, bp1, wp3, bp3,
                  wn1, bn1, wn3, bn3,
                  yh_out, ph_out, x1_out):
    n = pl.program_id(0)
    t = pl.program_id(1)
    flag = flags_ref[n * pl.num_programs(1) + t]
    lf = ylt[0, 0] * 0.5                                  # (ht, wt)

    @pl.when(flag > 0)
    def _active():
        # x arrives pre-masked by the lowres mask (XLA side)
        x0 = elu(_conv3x3_sum(xt[0, 0], w0, hl + 2, wl + 2) + b0[0])
        x0 = x0 * m_u0[0, 0][:, :wl + 2][:, :, None]            # (hl+2, wl+2, cd)
        # upsample to the high-res halo-2 window; mask with the upsample
        # mask (the skip was pre-masked with it in XLA)
        u = _up2(x0, hl + 2, wl + 2)[:, :wt + 4, :]
        u = u * m_up[0, 0][:, :wt + 4][:, :, None]
        s_m = st[0, 0][:, :wt + 4, :]
        # upconv1 = conv(concat(u, skip)) as split-weight sum
        x1 = elu(_conv3x3_sum(u, w1x, ht + 2, wt + 2)
                 + _conv3x3_sum(s_m, w1s, ht + 2, wt + 2) + b1[0])
        x1 = x1 * m_u1[0, 0][:, :wt + 2][:, :, None]            # (ht+2, wt+2, cd)
        # waveconv heads
        hp = leaky_relu_01(jax.lax.dot_general(
            x1, wp1[0], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bp1[0])
        hp = hp * m_u1[0, 0][:, :wt + 2][:, :, None]
        pos = sigmoid(_conv3x3_sum(hp, wp3, ht, wt) + bp3[0])
        hn = leaky_relu_01(jax.lax.dot_general(
            x1, wn1[0], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bn1[0])
        hn = hn * m_u1[0, 0][:, :wt + 2][:, :, None]
        neg = sigmoid(_conv3x3_sum(hn, wn3, ht, wt) + bn3[0])
        yh = (2.0 ** (i_scale - 1)) * (pos - neg)
        yh = yh * m_wv[0, 0][:, :, None]                  # (ht, wt, 3)

        yh_out[0, 0] = jnp.transpose(yh, (2, 0, 1))
        hf = yh * 0.5
        h0, h1, h2 = hf[..., 0], hf[..., 1], hf[..., 2]
        ph_out[0, 0, 0] = lf + h0 + h1 + h2
        ph_out[0, 0, 1] = lf + h0 - h1 - h2
        ph_out[0, 0, 2] = lf - h0 + h1 - h2
        ph_out[0, 0, 3] = lf - h0 - h1 + h2
        x1_out[0, 0] = x1[1:ht + 1, 1:wt + 1, :]

    @pl.when(flag == 0)
    def _inactive():
        yh_out[...] = jnp.zeros_like(yh_out)
        ph_out[0, 0, 0] = lf
        ph_out[0, 0, 1] = lf
        ph_out[0, 0, 2] = lf
        ph_out[0, 0, 3] = lf
        x1_out[...] = jnp.zeros_like(x1_out)


def _tile5(x: Array, n_h: int, n_w: int, th: int, tw: int, halo: int,
           wpad: int) -> Array:
    """(N, Hp+2*halo, >=Wp+..., C) -> (N, nT, th+2h, wpad, C) halo tiles."""
    tiles = []
    for ih in range(n_h):
        for iw in range(n_w):
            tiles.append(x[:, ih * th:ih * th + th + 2 * halo,
                           iw * tw:iw * tw + wpad, :])
    return jnp.stack(tiles, axis=1)


def _tile4(x: Array, n_h: int, n_w: int, th: int, tw: int, halo: int,
           wpad: int) -> Array:
    """2-D plane variant: (N, Hp+2h, >=...) -> (N, nT, th+2h, wpad)."""
    tiles = []
    for ih in range(n_h):
        for iw in range(n_w):
            tiles.append(x[:, ih * th:ih * th + th + 2 * halo,
                           iw * tw:iw * tw + wpad])
    return jnp.stack(tiles, axis=1)


def _pad_to(x: Array, h: int, w: int, halo: int, extra_w: int):
    """Zero-extend so every tile window is in-bounds."""
    pads = [(0, 0), (0, h + 2 * halo - x.shape[1]),
            (0, w + 2 * halo + extra_w - x.shape[2])]
    if x.ndim == 4:
        pads.append((0, 0))
    return jnp.pad(x, pads)


@functools.partial(jax.jit, static_argnames=("i_scale", "ht", "tw",
                                             "interpret"))
def fused_wave_stage(x: Array, skip: Array, yl: Array, mask: Array,
                     w0: Array, b0: Array, w1: Array, b1: Array,
                     wp1: Array, bp1: Array, wp3: Array, bp3: Array,
                     wn1: Array, bn1: Array, wn3: Array, bn3: Array,
                     i_scale: int, ht: int = 8, tw: int = 64,
                     interpret: Optional[bool] = None):
    """One sparse decoder scale, fused.

    Args:
      x: (N, Hl, Wl, Cx) low-res input (scale's entry features).
      skip: (N, 2Hl, 2Wl, Cs); yl: (N, 2Hl, 2Wl, 1) current low-pass.
      mask: (N, Hl, Wl, 1) raw threshold mask for this scale.
      w0/b0: upconv0; w1/b1: upconv1 over concat(up, skip) — split
      internally; wp*/wn*: pos/neg waveconv head params (1x1 then 3x3).
    Returns (yh (N,2Hl,2Wl,3), yl_new (N,4Hl,4Wl,1), x1 (N,2Hl,2Wl,Cd)),
    matching the masked-dense oracle for this stage.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n, h_l, w_l, cx = x.shape
    cs = skip.shape[-1]
    cd = w0.shape[-1]
    h_t2, w_t2 = 2 * h_l, 2 * w_l
    hl, wl = ht // 2, tw // 2
    n_h, n_w = -(-h_l // hl), -(-w_l // wl)
    n_tiles = n_h * n_w

    def su(v, m=8):
        return v if interpret else (-(-v // m) * m)

    # masks (XLA, cheap) — the ORACLE's per-op dilations, from the one
    # shared helper so a radius fix there cannot silently miss this copy
    from .sparse import stage_masks
    sm = stage_masks(mask)
    m_lowres = sm["lowres"]
    m_upconv0 = sm["upconv0"][..., 0]
    m_upsample = sm["upsample"]
    m_upconv1 = sm["upconv1"][..., 0]
    m_wavelet = sm["wavelet"][..., 0]

    # pre-mask the kernel inputs in XLA (exact: these are input masks)
    x = x * m_lowres
    skip = skip * m_upsample

    # spatially pad + tile every input
    xp = pad2d(x, 2, "reflect")
    wlp = su(wl + 4)
    xt = _tile5(_pad_to(xp, n_h * hl, n_w * wl, 2, wlp - (wl + 4)),
                n_h, n_w, hl, wl, 2, wlp)
    sp_ = pad2d(skip, 2, "reflect")
    wtp4 = su(tw + 4)
    st = _tile5(_pad_to(sp_, n_h * ht, n_w * tw, 2, wtp4 - (tw + 4)),
                n_h, n_w, ht, tw, 2, wtp4)
    ylt = _tile4(_pad_to(yl, n_h * ht, n_w * tw, 0, 0)[..., 0],
                 n_h, n_w, ht, tw, 0, tw)
    mt_u0 = _tile4(_pad_to(jnp.pad(m_upconv0, ((0, 0), (1, 1), (1, 1)))
                           [..., None], n_h * hl, n_w * wl, 1,
                           su(wl + 2) - (wl + 2))[..., 0],
                   n_h, n_w, hl, wl, 1, su(wl + 2))
    mt_up = _tile4(_pad_to(jnp.pad(m_upsample[..., 0],
                                   ((0, 0), (2, 2), (2, 2)))
                           [..., None], n_h * ht, n_w * tw, 2,
                           wtp4 - (tw + 4))[..., 0],
                   n_h, n_w, ht, tw, 2, wtp4)
    mt_u1 = _tile4(_pad_to(jnp.pad(m_upconv1, ((0, 0), (1, 1), (1, 1)))
                           [..., None], n_h * ht, n_w * tw, 1,
                           su(tw + 2) - (tw + 2))[..., 0],
                   n_h, n_w, ht, tw, 1, su(tw + 2))
    mt_wv = _tile4(_pad_to(m_wavelet[..., None], n_h * ht, n_w * tw,
                           0, 0)[..., 0],
                   n_h, n_w, ht, tw, 0, tw)

    # per-tile activity from upconv1 (the widest high-res compute mask)
    flags = (mt_u1.max(axis=(2, 3)) > 0).astype(jnp.int32).reshape(-1)

    w0r = w0.reshape(9, cx, cd)
    w1r = w1.reshape(9, cd + cs, cd)
    w1x = w1r[:, :cd, :]
    w1s = w1r[:, cd:, :]
    wp3r = wp3.reshape(9, cd, 3)
    wn3r = wn3.reshape(9, cd, 3)

    def vspec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def tspec(shape):
        return pl.BlockSpec((1, 1) + shape,
                            lambda nn_, t, *_: (nn_, t) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, n_tiles),
        in_specs=[
            tspec(xt.shape[2:]), tspec(st.shape[2:]),
            tspec(ylt.shape[2:]),
            tspec(mt_u0.shape[2:]),
            tspec(mt_up.shape[2:]), tspec(mt_u1.shape[2:]),
            tspec(mt_wv.shape[2:]),
            vspec(), vspec(), vspec(), vspec(), vspec(),   # w0 b0 w1x w1s b1
            vspec(), vspec(), vspec(), vspec(),            # wp1 bp1 wp3 bp3
            vspec(), vspec(), vspec(), vspec(),            # wn1 bn1 wn3 bn3
        ],
        out_specs=[
            tspec((3, ht, tw)),
            tspec((4, ht, tw)),
            tspec((ht, tw, cd)),
        ],
    )
    kernel = functools.partial(_fused_kernel, i_scale, hl, wl, wlp, ht,
                               tw, wtp4, cx, cs, cd)
    yh_t, ph_t, x1_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((n, n_tiles, 3, ht, tw), jnp.float32),
            jax.ShapeDtypeStruct((n, n_tiles, 4, ht, tw), jnp.float32),
            jax.ShapeDtypeStruct((n, n_tiles, ht, tw, cd), jnp.float32),
        ],
        interpret=interpret,
    )(flags, xt, st, ylt, mt_u0, mt_up, mt_u1, mt_wv,
      w0r, b0.reshape(1, 1, cd), w1x, w1s, b1.reshape(1, 1, cd),
      wp1.reshape(1, cd, cd), bp1.reshape(1, 1, cd), wp3r,
      bp3.reshape(1, 1, 3),
      wn1.reshape(1, cd, cd), bn1.reshape(1, 1, cd), wn3r,
      bn3.reshape(1, 1, 3))

    # un-tile
    def untile(tiles, ch_axis_last):
        if ch_axis_last:          # (N, nT, ht, tw, C)
            c = tiles.shape[-1]
            out = tiles.reshape(n, n_h, n_w, ht, tw, c).transpose(
                0, 1, 3, 2, 4, 5).reshape(n, n_h * ht, n_w * tw, c)
        else:                     # (N, nT, C, ht, tw)
            c = tiles.shape[2]
            out = tiles.reshape(n, n_h, n_w, c, ht, tw).transpose(
                0, 3, 1, 4, 2, 5).reshape(n, c, n_h * ht, n_w * tw)
            out = out.transpose(0, 2, 3, 1)
        return out[:, :h_t2, :w_t2]

    yh = untile(yh_t, False)                       # (N, 2Hl, 2Wl, 3)
    x1 = untile(x1_t, True)                        # (N, 2Hl, 2Wl, Cd)
    ph = untile(ph_t, False)                       # (N, 2Hl, 2Wl, 4)
    # interleave IDWT phases: (a b / d e) 2x2 blocks
    a, bq, d, e = ph[..., 0], ph[..., 1], ph[..., 2], ph[..., 3]
    top = jnp.stack([a, bq], axis=3).reshape(n, h_t2, 2 * w_t2)
    bot = jnp.stack([d, e], axis=3).reshape(n, h_t2, 2 * w_t2)
    yl_new = jnp.stack([top, bot], axis=2).reshape(n, 2 * h_t2,
                                                   2 * w_t2)[..., None]
    return yh, yl_new, x1

"""NYUv2 (DenseDepth-lineage) decoders: dense baseline, wavelet decoders,
and the sparse wavelet decoder — rebuilds of
`NYUv2/networks/decoders/densedepth_decoder.py` (Decoder :15-47,
Decoder224 :50-89, DecoderWave :92-148, DecoderWave224 :151-221,
SparseDecoderWave :224-409), NHWC.

Contract: tuple-keyed dicts like the KITTI decoders. NYU "disp" outputs
are raw linear values (no sigmoid) — depth in the training units, or
DepthNorm disparity in --disparity mode (`NYUv2/train.py:280-283`).

DecoderWave/SparseDecoderWave share one parameter structure: the sparse
path is the masked-dense formulation (ops/sparse.py), dense through scale
2 and sparse for scales 1 and 0, exactly as the reference
(`densedepth_decoder.py:280-312` dense prefix, `:314-406` sparse scales).

Known reference quirk NOT reproduced: `DecoderWave224` uses integer
division `ll // 2` for ("disp", 1) (`densedepth_decoder.py:212`) — a bug;
we use true division. The reference also double-counts `wave_idxmap` ops
at scale 1 of SparseDecoderWave (`:377-382`); we count it once.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import sparse as sp
from ..ops.convops import conv2d
from ..ops.image import pad2d, upsample_nearest2x
from ..ops.wavelets import haar_idwt
from .layers import Conv3x3, _torch_conv_init

Array = jnp.ndarray


def _leaky02(x: Array) -> Array:
    return jax.nn.leaky_relu(x, negative_slope=0.2)


class DWConv3x3(nn.Module):
    """Depthwise-separable Conv3x3 (`NYUv2/networks/layers.py:23-25,
    70-79`): pad -> depthwise 3x3 (no bias) -> ReLU -> pointwise 1x1
    (no bias)."""
    features: int
    pad_mode: str = "zero"

    @nn.compact
    def __call__(self, x: Array, in_mask=None, out_mask=None, nonlin=None,
                 use_pallas: bool = False):
        # use_pallas accepted for interface parity; the depthwise variant
        # always runs the XLA path
        cin = x.shape[-1]
        if in_mask is not None:
            x = x * in_mask
        wd = self.param("depthwise", _torch_conv_init, (3, 3, 1, cin))
        y = conv2d(pad2d(x, 1, self.pad_mode), wd, feature_group_count=cin)
        y = jax.nn.relu(y)
        if in_mask is not None:
            y = y * in_mask
        wp = self.param("pointwise", _torch_conv_init, (1, 1, cin,
                                                        self.features))
        y = conv2d(y, wp)
        if nonlin is not None:
            y = nonlin(y)
        if out_mask is not None:
            y = y * out_mask
        return y


def _conv3x3(features: int, pad_mode: str, depthwise: bool, name: str):
    if depthwise:
        return DWConv3x3(features, pad_mode, name=name)
    return Conv3x3(features, pad_mode, name=name)


class UpBlock(nn.Module):
    """UpSampleBlock (`NYUv2/networks/layers.py:57-67`): nearest-x2 ->
    concat skip -> Conv3x3(pad) -> LeakyReLU(0.2), maskable."""
    features: int
    pad_mode: str = "reflect"
    depthwise: bool = False
    # measured negative on v5e (see decoders_kitti.use_polyphase)
    use_polyphase: bool = False

    @nn.compact
    def __call__(self, x: Array, skip: Array, up_out_mask=None,
                 out_mask=None, in_mask=None, use_pallas: bool = False,
                 up_in_mask_lo=None):
        if in_mask is not None:
            x = x * in_mask
        if (self.use_polyphase and not self.depthwise and not use_pallas
                and not self.is_initializing()
                and (up_out_mask is None or up_in_mask_lo is not None)):
            # polyphase folding of upsample+conv (ops/convops.py): the
            # upsampled half of convA's input is 2x2-constant — 4/9 the
            # MACs on it and no (N, 2h, 2w, C) materialization; exact up
            # to fp reassociation (~1e-6). Masked path:
            # upsample(x) * up_out_mask == upsample(x * up_in_mask_lo)
            # because the 5x5-dilated upsampled mask is 2x2-constant
            # (the caller passes dilate3(mask) as the low-res twin).
            from ..ops.convops import upconv1_polyphase
            p = self.variables["params"]["convA"]
            xu = x if up_in_mask_lo is None else x * up_in_mask_lo
            sk = skip if up_out_mask is None else skip * up_out_mask
            y = upconv1_polyphase(xu, sk, p["kernel"], p["bias"],
                                  self.pad_mode, nonlin=_leaky02)
            return y if out_mask is None else y * out_mask
        up = jnp.concatenate([upsample_nearest2x(x), skip], axis=-1)
        if up_out_mask is not None:
            up = up * up_out_mask
        if self.depthwise:
            use_pallas = False
        return _conv3x3(self.features, self.pad_mode, self.depthwise,
                        "convA")(up, None, out_mask, nonlin=_leaky02,
                                 use_pallas=use_pallas)


class NyuDecoder(nn.Module):
    """DenseDepth baseline (`densedepth_decoder.py:15-47`): conv2 + four
    UpBlocks + 3x3 head, single ("disp", 0) at H/2."""
    num_ch_enc: Sequence[int]
    decoder_width: float = 0.5
    is_depthwise: bool = False
    use_polyphase: bool = False

    @nn.compact
    def __call__(self, features: Sequence[Array]) -> dict:
        f = int(self.num_ch_enc[-1] * self.decoder_width)
        pp = self.use_polyphase
        x = Conv3x3(f, "zero", name="conv2")(features[-1])
        x = UpBlock(f // 2, "zero", self.is_depthwise, pp, name="up1")(
            x, features[-2])
        x = UpBlock(f // 4, "zero", self.is_depthwise, pp, name="up2")(
            x, features[-3])
        x = UpBlock(f // 8, "zero", self.is_depthwise, pp, name="up3")(
            x, features[-4])
        x = UpBlock(f // 16, "zero", self.is_depthwise, pp, name="up4")(
            x, features[-5])
        d = _conv3x3(1, "zero", self.is_depthwise, "conv3")(x)
        return {("disp", 0): d}


class NyuDecoder224(nn.Module):
    """`Decoder224` (`densedepth_decoder.py:50-89`): Decoder plus an extra
    x2 upsample + conv5 stage -> full-resolution output."""
    num_ch_enc: Sequence[int]
    decoder_width: float = 0.5
    is_depthwise: bool = False
    use_polyphase: bool = False

    @nn.compact
    def __call__(self, features: Sequence[Array]) -> dict:
        f = int(self.num_ch_enc[-1] * self.decoder_width)
        pp = self.use_polyphase
        x = Conv3x3(f, "zero", name="conv2")(features[-1])
        x = UpBlock(f // 2, "zero", self.is_depthwise, pp, name="up1")(
            x, features[-2])
        x = UpBlock(f // 4, "zero", self.is_depthwise, pp, name="up2")(
            x, features[-3])
        x = UpBlock(f // 8, "zero", self.is_depthwise, pp, name="up3")(
            x, features[-4])
        x = UpBlock(f // 16, "zero", self.is_depthwise, pp, name="up4")(
            x, features[-5])
        x = upsample_nearest2x(x)
        x = _leaky02(_conv3x3(f // 32, "zero", self.is_depthwise,
                              "conv5")(x))
        d = _conv3x3(1, "zero", self.is_depthwise, "conv3")(x)
        return {("disp", 0): d}


class NyuDecoderWave(nn.Module):
    """DecoderWave + SparseDecoderWave in one module.

    Dense (`thresh_ratio=None`): `densedepth_decoder.py:117-148`.
    Sparse (`thresh_ratio` set): `densedepth_decoder.py:271-409` — dense
    through scale 2, masked-sparse scales 1 and 0, with op counters.
    """
    num_ch_enc: Sequence[int]
    decoder_width: float = 0.5
    dw_waveconv: bool = False
    dw_upconv: bool = False
    use_polyphase: bool = False

    def setup(self):
        f = int(self.num_ch_enc[-1] * self.decoder_width)
        pp = self.use_polyphase
        self.f = f
        self.conv2 = Conv3x3(f, "replicate", name="conv2")
        self.up1 = UpBlock(f // 2, "reflect", self.dw_upconv, pp,
                           name="up1")
        self.wave1_ll = Conv3x3(1, "replicate", name="wave1_ll")
        self.wave1 = _conv3x3(3, "zero", self.dw_waveconv, "wave1")
        self.up2 = UpBlock(f // 4, "reflect", self.dw_upconv, pp,
                           name="up2")
        self.wave2 = _conv3x3(3, "zero", self.dw_waveconv, "wave2")
        self.up3 = UpBlock(f // 8, "reflect", self.dw_upconv, pp,
                           name="up3")
        self.wave3 = _conv3x3(3, "zero", self.dw_waveconv, "wave3")

    def _log(self, outputs, s, yl, h):
        if yl is not None:
            outputs[("wavelets", s, "LL")] = yl
        outputs[("wavelets", s, "LH")] = h[..., 0:1]
        outputs[("wavelets", s, "HL")] = h[..., 1:2]
        outputs[("wavelets", s, "HH")] = h[..., 2:3]

    def __call__(self, features: Sequence[Array],
                 thresh_ratio: Optional[float] = None,
                 use_pallas: bool = False) -> dict:
        if thresh_ratio is None:
            return self._dense(features)
        return self._sparse(features, thresh_ratio, use_pallas)

    def _dense(self, features: Sequence[Array]) -> dict:
        outputs = {}
        x_d1 = self.up1(self.conv2(features[-1]), features[-2])
        ll = (2.0 ** 3) * self.wave1_ll(x_d1)
        outputs[("disp", 3)] = ll / (2.0 ** 3)
        h = (2.0 ** 2) * self.wave1(x_d1)
        self._log(outputs, 2, ll, h)
        ll = haar_idwt(ll, h[..., 0:1], h[..., 1:2], h[..., 2:3])
        outputs[("disp", 2)] = ll / (2.0 ** 2)

        x_d2 = self.up2(x_d1, features[-3])
        h = 2.0 * self.wave2(x_d2)
        self._log(outputs, 1, None, h)
        ll = haar_idwt(ll, h[..., 0:1], h[..., 1:2], h[..., 2:3])
        outputs[("disp", 1)] = ll / 2.0

        x_d3 = self.up3(x_d2, features[-4])
        h = self.wave3(x_d3)
        self._log(outputs, 0, None, h)
        ll = haar_idwt(ll, h[..., 0:1], h[..., 1:2], h[..., 2:3])
        outputs[("disp", 0)] = ll
        return outputs

    def _sparse(self, features: Sequence[Array], thresh_ratio,
                use_pallas: bool = False) -> dict:
        outputs = {}
        total = jnp.zeros((features[-1].shape[0],), jnp.float32)

        x_m1 = features[-1]
        total += sp.ops_dense_conv3x3_nyu(x_m1.shape, self.f)
        x_d0 = self.conv2(x_m1)
        x_d1 = self.up1(x_d0, features[-2])
        cat_c = x_d0.shape[-1] + features[-2].shape[-1]
        total += jnp.float32((1 + 9 * cat_c) * x_d1.shape[1]
                             * x_d1.shape[2] * x_d1.shape[3])
        ll = (2.0 ** 3) * self.wave1_ll(x_d1)
        outputs[("disp", 3)] = ll / (2.0 ** 3)
        h = (2.0 ** 2) * self.wave1(x_d1)
        total += jnp.float32((1 + 9 * x_d1.shape[-1]) * x_d1.shape[1]
                             * x_d1.shape[2] * 4)
        outputs[("wavelet_mask", 2)] = jnp.ones_like(h[..., 0:1])
        self._log(outputs, 2, ll, h)
        ll = haar_idwt(ll, h[..., 0:1], h[..., 1:2], h[..., 2:3])
        total += jnp.float32(ll.shape[1] * ll.shape[2])
        outputs[("disp", 2)] = ll / (2.0 ** 2)

        # sparse scales: (stage index, up block, wave conv, skip, 2^s coeff
        # scale, disp divisor)
        x = x_d1
        for s, up, wave, skip, coeff_pow in (
                (1, self.up2, self.wave2, features[-3], 1),
                (0, self.up3, self.wave3, features[-4], 0)):
            # per-image threshold via the shared helper
            # (ops/sparse.wavelet_threshold_mask): identical to the
            # reference's global ll.max()-ll.min()
            # (`densedepth_decoder.py:316,363`) at batch 1 — which is
            # how the reference evaluates (`utils.py:310-311` slices
            # one image per "batch") — and keeps batched sparse decode
            # equal to N batch-1 runs instead of coupling masks across
            # the batch
            mask = sp.wavelet_threshold_mask(ll, h, thresh_ratio)
            total += sp.ops_threshold(mask)
            umask = upsample_nearest2x(mask)
            up_mask = sp.dilate_mask(mask, 5)
            conva_mask = sp.dilate_mask(umask, 5)
            wave_mask = sp.dilate_mask(umask, 3)
            wavelet_mask = umask
            total += sp.ops_dilation(mask)
            for m in (wavelet_mask, conva_mask, wave_mask, up_mask):
                total += sp.ops_mask2idxmap(m)
            outputs[("wavelet_mask", s)] = wavelet_mask

            cat_c = x.shape[-1] + skip.shape[-1]
            x = up(x, skip, in_mask=up_mask, up_out_mask=conva_mask,
                   out_mask=wave_mask, use_pallas=use_pallas,
                   up_in_mask_lo=sp.dilate_mask(mask, 3))
            total += sp.ops_sparse_conv3x3(
                sp.mask_count(wave_mask), cat_c, x.shape[-1])
            if use_pallas and not self.dw_waveconv:
                h = wave(x, None, wavelet_mask, nonlin=None,
                         use_pallas=True)
            else:
                h = wave(x, None, wavelet_mask)
            total += sp.ops_sparse_conv3x3(
                sp.mask_count(wavelet_mask), x.shape[-1], 3)
            h = (2.0 ** coeff_pow) * h
            self._log(outputs, s, None, h)
            ll = haar_idwt(ll, h[..., 0:1], h[..., 1:2], h[..., 2:3])
            total += jnp.float32(ll.shape[1] * ll.shape[2])
            outputs[("disp", s)] = ll / (2.0 ** coeff_pow)

        outputs[("total_ops", -1)] = total
        return outputs


class NyuDecoderWave224(nn.Module):
    """`DecoderWave224` (`densedepth_decoder.py:151-221`): four wavelet
    stages (extra up4/wave4), coefficient scales 2^4..2^0."""
    num_ch_enc: Sequence[int]
    decoder_width: float = 0.5
    dw_waveconv: bool = False
    dw_upconv: bool = False
    use_polyphase: bool = False

    @nn.compact
    def __call__(self, features: Sequence[Array]) -> dict:
        f = int(self.num_ch_enc[-1] * self.decoder_width)
        pp = self.use_polyphase
        outputs = {}

        def log(s, yl, h):
            if yl is not None:
                outputs[("wavelets", s, "LL")] = yl
            outputs[("wavelets", s, "LH")] = h[..., 0:1]
            outputs[("wavelets", s, "HL")] = h[..., 1:2]
            outputs[("wavelets", s, "HH")] = h[..., 2:3]

        x_d1 = UpBlock(f // 2, "reflect", self.dw_upconv, pp, name="up1")(
            Conv3x3(f, "replicate", name="conv2")(features[-1]),
            features[-2])
        ll = (2.0 ** 4) * Conv3x3(1, "replicate", name="wave1_ll")(x_d1)
        h = (2.0 ** 3) * _conv3x3(3, "zero", self.dw_waveconv,
                                  "wave1")(x_d1)
        log(3, ll, h)
        ll = haar_idwt(ll, h[..., 0:1], h[..., 1:2], h[..., 2:3])
        outputs[("disp", 3)] = ll / (2.0 ** 3)

        x_d2 = UpBlock(f // 4, "reflect", self.dw_upconv, pp, name="up2")(
            x_d1, features[-3])
        h = (2.0 ** 2) * _conv3x3(3, "zero", self.dw_waveconv,
                                  "wave2")(x_d2)
        log(2, None, h)
        ll = haar_idwt(ll, h[..., 0:1], h[..., 1:2], h[..., 2:3])
        outputs[("disp", 2)] = ll / (2.0 ** 2)

        x_d3 = UpBlock(f // 8, "reflect", self.dw_upconv, pp, name="up3")(
            x_d2, features[-4])
        h = 2.0 * _conv3x3(3, "zero", self.dw_waveconv, "wave3")(x_d3)
        log(1, None, h)
        ll = haar_idwt(ll, h[..., 0:1], h[..., 1:2], h[..., 2:3])
        outputs[("disp", 1)] = ll / 2.0   # ref uses // (int-div bug), we /

        x_d4 = UpBlock(f // 16, "reflect", self.dw_upconv, pp, name="up4")(
            x_d3, features[-5])
        h = _conv3x3(3, "zero", self.dw_waveconv, "wave4")(x_d4)
        log(0, None, h)
        ll = haar_idwt(ll, h[..., 0:1], h[..., 1:2], h[..., 2:3])
        outputs[("disp", 0)] = ll
        return outputs

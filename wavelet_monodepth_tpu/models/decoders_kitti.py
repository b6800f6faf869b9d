"""KITTI depth decoders: monodepth2 baseline, dense wavelet decoder, and
the sparse (threshold-gated) wavelet decoder — one flax module per family,
with dense/sparse sharing a single parameter structure so one trained
checkpoint drives both (the reference loads the same weights into
`DepthWaveProgressiveDecoder` and `SparseDepthWaveProgressiveDecoder`,
`KITTI/networks/decoders/depth_decoder.py:72-168,171-428`).

Output contract (NHWC) mirrors the reference's tuple-keyed dicts:
  ("disp", s)                     s in 0..3   disparity in [0,1]
  ("wavelets", s, "LL"/"LH"/"HL"/"HH")        coefficient images
  ("wavelet_mask", s), ("lowres_mask", s), ... sparse mode only
  ("total_ops", s), ("total_ops", -1)          sparse mode only

(The reference keys the grand total as the *string* "total_ops"; JAX
pytree dict keys must sort against each other, so the total is keyed
("total_ops", -1) here.)

Sparsity is computed via static-shape masked-dense ops (ops/sparse.py):
bit-equal to the reference engine, and at thresh_ratio <= -1 every mask is
all-ones so sparse output == dense output exactly (the notebook oracle the
reference uses for verification).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import sparse as sp
from ..ops.wavelets import haar_idwt
from ..parallel.spatial_hints import hint as _spatial_hint
from .layers import Conv3x3, ConvBlock, WaveConv, upsample_concat

Array = jnp.ndarray

NUM_CH_DEC = (16, 32, 64, 128, 256)


def _idwt(yl, yh):
    """haar_idwt with spatial-mesh sharding hints (no-ops off-mesh):
    coefficients are re-pinned (replicated when too short to band) so
    the interleave reshapes never trigger GSPMD involuntary
    rematerialization under height banding (round-2 dryrun tail)."""
    yl = _spatial_hint(yl)
    yh = _spatial_hint(yh)
    return _spatial_hint(haar_idwt(yl, yh[..., 0:1], yh[..., 1:2],
                                   yh[..., 2:3]))


class DepthDecoder(nn.Module):
    """monodepth2 baseline decoder (`depth_decoder.py:18-69`): five
    upconv stages, per-scale dispconv + sigmoid. ConvBlocks use zero
    padding (reference default use_refl=False there), dispconvs reflect."""
    num_ch_enc: Sequence[int]
    scales: Sequence[int] = (0, 1, 2, 3)
    use_skips: bool = True
    use_polyphase: bool = False    # see KittiWaveletDecoder.use_polyphase (measured negative on v5e)

    @nn.compact
    def __call__(self, features: Sequence[Array]) -> dict:
        from ..ops.convops import upconv1_polyphase
        outputs = {}
        x = features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(NUM_CH_DEC[i], "zero", name=f"upconv_{i}_0")(x)
            skip = features[i - 1] if (self.use_skips and i > 0) else None
            if (skip is not None and self.use_polyphase
                    and not self.is_initializing()):
                p = self.variables["params"][f"upconv_{i}_1"]["conv"]
                x = upconv1_polyphase(x, skip, p["kernel"], p["bias"],
                                      "zero", nonlin=jax.nn.elu)
            else:
                x = upsample_concat(x, skip)
                x = ConvBlock(NUM_CH_DEC[i], "zero",
                              name=f"upconv_{i}_1")(x)
            if i in self.scales:
                d = Conv3x3(1, "reflect", name=f"dispconv_{i}")(x)
                outputs[("disp", i)] = jax.nn.sigmoid(d)
        return outputs


class KittiWaveletDecoder(nn.Module):
    """DepthWaveProgressiveDecoder + its sparse twin in one module.

    Dense forward (`thresh_ratio=None`): `depth_decoder.py:138-168`.
    Sparse forward (`thresh_ratio` set): `depth_decoder.py:292-428` —
    per-scale threshold -> dilated masks -> masked upconvs/waveconvs,
    with the reference's analytic op counters.
    """
    num_ch_enc: Sequence[int]
    use_skips: bool = True
    # Polyphase folding of upsample+upconv_X_1 (ops/convops.py): exact
    # up to fp reassociation (~6e-6 f32; thresh=-1 sparse==dense stays
    # bit-equal), but a measured NEGATIVE on the v5e — bf16 0.95x,
    # f32 0.75x: the phase-conv output + interleave materialize ~2x the
    # bytes the 19% MAC cut saves on this bandwidth-bound net (PERF.md
    # round 3, tools_dev/polyphase_experiment.py). Kept as an option
    # for other shapes/platforms.
    use_polyphase: bool = False

    def setup(self):
        blocks = {}
        for i in range(4, 0, -1):
            blocks[f"upconv_{i}_0"] = ConvBlock(
                NUM_CH_DEC[i], "reflect", name=f"upconv_{i}_0")
            blocks[f"upconv_{i}_1"] = ConvBlock(
                NUM_CH_DEC[i], "reflect", name=f"upconv_{i}_1")
            if i == 4:
                blocks["waveconv_4_ll"] = WaveConv(
                    NUM_CH_DEC[4] // 4, 1, name="waveconv_4_ll")
            blocks[f"waveconv_{i}_pos"] = WaveConv(
                NUM_CH_DEC[i], 3, name=f"waveconv_{i}_pos")
            blocks[f"waveconv_{i}_neg"] = WaveConv(
                NUM_CH_DEC[i], 3, name=f"waveconv_{i}_neg")
        self.blocks = blocks

    def _coefficients(self, x: Array, i: int, want_ll: bool,
                      in_mask: Optional[Array] = None,
                      out_mask: Optional[Array] = None,
                      use_pallas: bool = False,
                      capacity_ratio: float = 0.5):
        """(LL, HF) heads at scale i: yl = 2^i * sigmoid(ll-head),
        yh = 2^(i-1) * (sigmoid(pos) - sigmoid(neg))
        (`depth_decoder.py:126-136`).

        Dense path runs the pos+neg heads as ONE conv pair (concatenated
        1x1 squeeze, block-diagonal 3x3) — mathematically identical
        (zero blocks contribute exact zeros) and 1.7x faster on a v5e:
        the separate 32->3 convs waste MXU lanes (PERF.md traced table).
        """
        yl = None
        if want_ll:
            yl = (2.0 ** i) * self.blocks["waveconv_4_ll"](
                x, in_mask, out_mask)
        if (use_pallas in (False, "xla", "compact", "sites")
                and not self.is_initializing()):
            yh = (2.0 ** (i - 1)) * self._paired_heads(x, i, in_mask,
                                                       out_mask)
            return yl, yh
        pos = self.blocks[f"waveconv_{i}_pos"](
            x, in_mask, out_mask, use_pallas=use_pallas,
            capacity_ratio=capacity_ratio)
        neg = self.blocks[f"waveconv_{i}_neg"](
            x, in_mask, out_mask, use_pallas=use_pallas,
            capacity_ratio=capacity_ratio)
        yh = (2.0 ** (i - 1)) * (pos - neg)          # (N, H, W, 3)
        return yl, yh

    def _paired_heads(self, x: Array, i: int,
                      in_mask: Optional[Array] = None,
                      out_mask: Optional[Array] = None) -> Array:
        """sigmoid(pos(x)) - sigmoid(neg(x)) with both heads fused into a
        single 1x1 (C->2M) + leaky + block-diagonal 3x3 (2M->6). Reads the
        two heads' params directly (the param tree is unchanged; init
        always takes the per-head path above so the tree is created by the
        WaveConv modules themselves). Masks follow masked_waveconv exactly
        (the shared in_mask re-masks the squeeze, the shared out_mask
        distributes over the subtraction): 1.7x faster than separate heads
        on a v5e — the 32->3 convs waste MXU lanes (PERF.md traced table)."""
        from ..ops.convops import conv1x1, conv3x3
        p = self.variables["params"]
        pp = p[f"waveconv_{i}_pos"]
        pn = p[f"waveconv_{i}_neg"]
        w1 = jnp.concatenate([pp["squeeze"]["kernel"],
                              pn["squeeze"]["kernel"]], axis=-1)
        b1 = jnp.concatenate([pp["squeeze"]["bias"],
                              pn["squeeze"]["bias"]])
        if in_mask is not None:
            x = x * in_mask
        h = conv1x1(x, w1, b1)
        h = jnp.where(h >= 0, h, 0.1 * h)            # LeakyReLU(0.1)
        if in_mask is not None:
            h = h * in_mask
        m = pp["conv"]["kernel"].shape[2]
        w3 = jnp.zeros((3, 3, 2 * m, 6), h.dtype)
        w3 = w3.at[:, :, :m, :3].set(pp["conv"]["kernel"])
        w3 = w3.at[:, :, m:, 3:].set(pn["conv"]["kernel"])
        b3 = jnp.concatenate([pp["conv"]["bias"], pn["conv"]["bias"]])
        y = jax.nn.sigmoid(conv3x3(h, w3, b3, "reflect"))
        yh = y[..., :3] - y[..., 3:]
        if out_mask is not None:
            yh = yh * out_mask
        return yh

    def _log_coeffs(self, outputs: dict, s: int, yl: Array, yh: Array):
        outputs[("wavelets", s, "LL")] = yl
        outputs[("wavelets", s, "LH")] = yh[..., 0:1]
        outputs[("wavelets", s, "HL")] = yh[..., 1:2]
        outputs[("wavelets", s, "HH")] = yh[..., 2:3]

    def __call__(self, features: Sequence[Array],
                 thresh_ratio: Optional[float] = None,
                 sparse_scales: Sequence[int] = (1, 2, 3),
                 use_pallas=False, compact_cap: float = 0.5,
                 mask_override: Optional[dict] = None) -> dict:
        # use_pallas: False/"xla" masked-dense, True/"pallas" stripe
        # kernel, "pallas2d" 2-D tiles, "capacity" per-conv XLA
        # compaction, "compact" whole-stage tile compaction
        # (ops/compact.py). compact_cap is the capacity ratio for BOTH
        # compacted backends ("compact" per stage, "capacity" per conv);
        # active tiles beyond capacity are dropped lowest-activity-first.
        # mask_override: {scale i: (N, Hl, Wl, 1) raw mask}
        # replaces the threshold mask at those scales (benchmarking at a
        # prescribed mask geometry; dilations still run in-graph).
        if thresh_ratio is None:
            return self._dense(features)
        return self._sparse(features, thresh_ratio, tuple(sparse_scales),
                            use_pallas, compact_cap, mask_override)

    def _upconv1(self, x0: Array, skip: Optional[Array], i: int,
                 in_mask_lo: Optional[Array] = None,
                 cat_mask: Optional[Array] = None,
                 out_mask: Optional[Array] = None) -> Array:
        """upsample -> concat skip -> upconv_{i}_1 -> ELU (+ masks), via
        the polyphase folding when eligible. Masked-dense identity:
        u * m_up == upsample(x0 * dilate3(mask)) because the reference's
        5x5 dilation of an upsampled mask IS 2x2-constant
        (`depth_decoder.py:313-319`; verified in tests), so the caller
        passes in_mask_lo = masks['lowres'] and cat_mask =
        masks['upsample'] for the skip half."""
        from ..ops.convops import upconv1_polyphase
        if (skip is not None and self.use_polyphase
                and not self.is_initializing()):
            p = self.variables["params"][f"upconv_{i}_1"]["conv"]
            xu = x0 if in_mask_lo is None else x0 * in_mask_lo
            sk = skip if cat_mask is None else skip * cat_mask
            y = upconv1_polyphase(xu, sk, p["kernel"], p["bias"],
                                  "reflect", nonlin=jax.nn.elu)
            return y if out_mask is None else y * out_mask
        x = upsample_concat(x0, skip, out_mask=cat_mask)
        return self.blocks[f"upconv_{i}_1"](x, out_mask=out_mask)

    def _dense(self, features: Sequence[Array]) -> dict:
        outputs = {}
        x = features[-1]
        yl = None
        for i in range(4, 0, -1):
            x = self.blocks[f"upconv_{i}_0"](x)
            skip = features[i - 1] if (self.use_skips and i > 0) else None
            x = self._upconv1(x, skip, i)
            new_yl, yh = self._coefficients(x, i, want_ll=(i == 4))
            if i == 4:
                yl = new_yl
            self._log_coeffs(outputs, i - 1, yl, yh)
            yl = _idwt(yl, yh)
            outputs[("disp", i - 1)] = jnp.clip(yl / (2.0 ** (i - 1)), 0, 1)
        return outputs

    def _compact_stage(self, x: Array, skip: Array, mask: Array, i: int,
                       cap_ratio: float, backend: str = "compact"):
        """Whole-stage compacted execution: 'compact' = tile granularity
        (ops/compact.py), 'sites' = pixel granularity (ops/sites.py, the
        fast path — bit-equal to the oracle). Returns (yh, x1) for scale
        i, reading this scale's params directly (the param tree is
        created by the module path, like _paired_heads)."""
        p = self.variables["params"]
        c0 = p[f"upconv_{i}_0"]["conv"]
        c1 = p[f"upconv_{i}_1"]["conv"]
        wp = p[f"waveconv_{i}_pos"]
        wn = p[f"waveconv_{i}_neg"]
        params = (c0["kernel"], c0["bias"], c1["kernel"], c1["bias"],
                  wp["squeeze"]["kernel"], wp["squeeze"]["bias"],
                  wp["conv"]["kernel"], wp["conv"]["bias"],
                  wn["squeeze"]["kernel"], wn["squeeze"]["bias"],
                  wn["conv"]["kernel"], wn["conv"]["bias"])
        if backend == "sites":
            from ..ops.sites import site_wave_stage, stage_site_overflow
            yh, x1 = site_wave_stage(
                x, skip, mask, *params, i_scale=i,
                cap_hi=min(1.0, 2 * cap_ratio),
                cap_lo=min(1.0, 2.8 * cap_ratio),
                cap_wav=min(1.0, 1.4 * cap_ratio))
            overflow = stage_site_overflow(
                mask, cap_lo=min(1.0, 2.8 * cap_ratio),
                cap_hi=min(1.0, 2 * cap_ratio),
                cap_wav=min(1.0, 1.4 * cap_ratio))
            return yh, x1, overflow
        from ..ops.compact import (compact_wave_stage, default_tile_shape,
                                   stage_capacity_overflow)
        th, tw = default_tile_shape(2 * x.shape[1], 2 * x.shape[2])
        yh, x1 = compact_wave_stage(x, skip, mask, *params, i_scale=i,
                                    th=th, tw=tw, cap_ratio=cap_ratio)
        return yh, x1, stage_capacity_overflow(mask, th, tw, cap_ratio)

    def _sparse(self, features: Sequence[Array], thresh_ratio,
                sparse_scales: tuple, use_pallas: bool = False,
                compact_cap: float = 0.5,
                mask_override: Optional[dict] = None) -> dict:
        outputs = {}
        x = features[-1]
        yl = None
        yh = None
        # per-image op counts (N,) — each batched image accounts exactly
        # like a reference batch-1 run (`depth_decoder.py:297-329`)
        total_ops = jnp.zeros((x.shape[0],), jnp.float32)
        for i in range(4, 0, -1):
            scale_ops = jnp.zeros((x.shape[0],), jnp.float32)
            if i == 4:
                mask = jnp.ones_like(x[..., :1])
            elif mask_override is not None and i in mask_override:
                mask = mask_override[i].astype(x.dtype)
                scale_ops += sp.ops_threshold(mask)
            else:
                mask = sp.wavelet_threshold_mask(yl, yh, thresh_ratio)
                scale_ops += sp.ops_threshold(mask)
            masks = sp.stage_masks(mask)
            scale_ops += sp.ops_dilation(mask)

            s = i - 1
            outputs[("lowres_mask", s)] = masks["lowres"]
            outputs[("upconv0_mask", s)] = masks["upconv0"]
            outputs[("upsample_mask", s)] = masks["upsample"]
            outputs[("upconv1_mask", s)] = masks["upconv1"]
            outputs[("wavelet_mask", s)] = masks["wavelet"]

            skip = features[i - 1] if (self.use_skips and i > 0) else None

            if i in sparse_scales and i != 4:
                for key in ("lowres", "upconv0", "upsample", "upconv1"):
                    scale_ops += sp.ops_mask2idxmap(masks[key])
                ichn0 = x.shape[-1]
                if (use_pallas in ("compact", "sites")
                        and not self.is_initializing()):
                    if skip is None:
                        raise ValueError(
                            "use_pallas='compact'/'sites' whole-stage "
                            "backends require use_skips=True (their "
                            "upconv1 kernels consume the encoder skip); "
                            "use the masked-dense/'xla'/'capacity' "
                            "backends for skip-less decoding")
                    scale_ops += sp.ops_sparse_conv3x3(
                        sp.mask_count(masks["upconv0"]), ichn0,
                        NUM_CH_DEC[i])
                    scale_ops += sp.ops_sparse_conv3x3(
                        sp.mask_count(masks["upconv1"]),
                        NUM_CH_DEC[i] + skip.shape[-1], NUM_CH_DEC[i])
                    n_in = sp.mask_count(masks["upconv1"])
                    n_out = sp.mask_count(masks["wavelet"])
                    for _ in range(2):   # pos + neg heads
                        scale_ops += sp.ops_sparse_conv1x1(
                            n_in, NUM_CH_DEC[i], NUM_CH_DEC[i])
                        scale_ops += sp.ops_sparse_conv3x3(
                            n_out, NUM_CH_DEC[i], 3)
                    yh, x, overflow = self._compact_stage(
                        x, skip, mask, i, compact_cap, use_pallas)
                    # dropped sites/tiles past the static capacity: 0 =
                    # this scale matched the oracle (ADVICE r2: silent
                    # capacity overflow must be observable)
                    outputs[("overflow", s)] = overflow
                    self._log_coeffs(outputs, s, yl, yh)
                    yl = _idwt(yl, yh)
                    scale_ops += sp.ops_idwt(yl.shape)
                    outputs[("disp", s)] = jnp.clip(yl / (2.0 ** s), 0, 1)
                    outputs[("total_ops", s)] = scale_ops
                    total_ops += scale_ops
                    continue
                if use_pallas == "capacity":
                    from ..ops.capacity import conv_capacity_overflow
                    outputs[("overflow", s)] = (
                        conv_capacity_overflow(
                            masks["upconv0"], capacity_ratio=compact_cap)
                        + conv_capacity_overflow(
                            masks["upconv1"], capacity_ratio=compact_cap)
                        + 2 * conv_capacity_overflow(
                            masks["wavelet"], capacity_ratio=compact_cap))
                x = self.blocks[f"upconv_{i}_0"](
                    x, in_mask=masks["lowres"],
                    out_mask=masks["upconv0"], use_pallas=use_pallas,
                    capacity_ratio=compact_cap)
                scale_ops += sp.ops_sparse_conv3x3(
                    sp.mask_count(masks["upconv0"]), ichn0, NUM_CH_DEC[i])
                ichn1 = NUM_CH_DEC[i] + (skip.shape[-1]
                                         if skip is not None else 0)
                if use_pallas in (False, "xla"):
                    x = self._upconv1(x, skip, i,
                                      in_mask_lo=masks["lowres"],
                                      cat_mask=masks["upsample"],
                                      out_mask=masks["upconv1"])
                else:
                    x = upsample_concat(x, skip,
                                        out_mask=masks["upsample"])
                    x = self.blocks[f"upconv_{i}_1"](
                        x, out_mask=masks["upconv1"],
                        use_pallas=use_pallas,
                        capacity_ratio=compact_cap)
                scale_ops += sp.ops_sparse_conv3x3(
                    sp.mask_count(masks["upconv1"]), ichn1, NUM_CH_DEC[i])
                _, yh = self._coefficients(
                    x, i, want_ll=False,
                    in_mask=masks["upconv1"], out_mask=masks["wavelet"],
                    use_pallas=use_pallas, capacity_ratio=compact_cap)
                n_in = sp.mask_count(masks["upconv1"])
                n_out = sp.mask_count(masks["wavelet"])
                for _ in range(2):   # pos + neg heads
                    scale_ops += sp.ops_sparse_conv1x1(
                        n_in, NUM_CH_DEC[i], NUM_CH_DEC[i])
                    scale_ops += sp.ops_sparse_conv3x3(
                        n_out, NUM_CH_DEC[i], 3)
            else:
                scale_ops += sp.ops_dense_conv3x3(x.shape, NUM_CH_DEC[i])
                x = self.blocks[f"upconv_{i}_0"](x)
                ux_shape = (x.shape[0], 2 * x.shape[1], 2 * x.shape[2],
                            NUM_CH_DEC[i] + (skip.shape[-1]
                                             if skip is not None else 0))
                scale_ops += sp.ops_dense_conv3x3(ux_shape, NUM_CH_DEC[i])
                x = self._upconv1(x, skip, i)
                want_ll = (i == 4)
                new_yl, yh = self._coefficients(x, i, want_ll=want_ll)
                yh = yh * masks["wavelet"]
                if want_ll:
                    yl = new_yl
                    scale_ops += sp.ops_dense_conv1x1(
                        x.shape, NUM_CH_DEC[4], NUM_CH_DEC[4] // 4)
                    scale_ops += sp.ops_dense_conv3x3(
                        x.shape[:3] + (NUM_CH_DEC[4] // 4,), 1)
                for _ in range(2):
                    scale_ops += sp.ops_dense_conv1x1(
                        x.shape, NUM_CH_DEC[i], NUM_CH_DEC[i])
                    scale_ops += sp.ops_dense_conv3x3(x.shape, 3)

            self._log_coeffs(outputs, s, yl, yh)
            yl = _idwt(yl, yh)
            scale_ops += sp.ops_idwt(yl.shape)
            outputs[("disp", s)] = jnp.clip(yl / (2.0 ** s), 0, 1)
            outputs[("total_ops", s)] = scale_ops
            total_ops += scale_ops
        outputs[("total_ops", -1)] = total_ops
        return outputs

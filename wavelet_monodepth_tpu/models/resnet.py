"""ResNet encoders (18/34/50/101/152) in flax, NHWC, emitting the 5-level
feature pyramid the decoders consume.

TPU-native rebuild of `KITTI/networks/encoders/resnet_encoder.py:62-98`
(torchvision-compatible topology so its checkpoints can be imported by
tools/torch_import.py): conv7x7/2 -> [relu feat0] -> maxpool3/2 ->
layer1..4 at strides 4..32. `num_ch_enc = [64, 64, 128, 256, 512]`
(x4 on the last three for Bottleneck variants). Input normalization
(x - 0.45) / 0.225 matches `resnet_encoder.py:89`; multi-image input for
the pose encoder mirrors `resnet_encoder.py:17-59`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray

_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
           101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
_BOTTLENECK = {18: False, 34: False, 50: True, 101: True, 152: True}


def num_ch_enc(num_layers: int) -> tuple[int, ...]:
    if _BOTTLENECK[num_layers]:
        return (64, 256, 512, 1024, 2048)
    return (64, 64, 128, 256, 512)


class _ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    (self.stride, self.stride),
                    padding=[(p, p), (p, p)], use_bias=False,
                    name="conv")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        identity = x
        y = _ConvBN(self.features, 3, self.stride, name="conv1")(x, train)
        y = jax.nn.relu(y)
        y = _ConvBN(self.features, 3, 1, name="conv2")(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = _ConvBN(self.features, 1, self.stride,
                               name="downsample")(x, train)
        return jax.nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int            # output channels (= 4 * width)
    stride: int = 1
    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        width = self.features // 4
        identity = x
        y = jax.nn.relu(_ConvBN(width, 1, 1, name="conv1")(x, train))
        # stride lives on the 3x3 (torchvision resnet v1.5)
        y = jax.nn.relu(_ConvBN(width, 3, self.stride, name="conv2")(y, train))
        y = _ConvBN(self.features, 1, 1, name="conv3")(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = _ConvBN(self.features, 1, self.stride,
                               name="downsample")(x, train)
        return jax.nn.relu(y + identity)


def _max_pool_3x3_s2(x: Array) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


class ResnetEncoder(nn.Module):
    """Returns [feat0 (H/2), feat1 (H/4), ..., feat4 (H/32)]."""
    num_layers: int = 18
    num_input_images: int = 1
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> list[Array]:
        blocks = _BLOCKS[self.num_layers]
        block_cls = Bottleneck if _BOTTLENECK[self.num_layers] else BasicBlock
        chans = num_ch_enc(self.num_layers)
        # flax infers the stem's input channels from the first apply;
        # num_input_images exists to CHECK the caller fed the multi-image
        # concat it declared (the reference sizes conv1 from it,
        # `resnet_encoder.py:26,46`) — a 3-channel init of a 2-image
        # encoder would otherwise silently build the wrong stem
        assert x.shape[-1] == 3 * self.num_input_images, (
            f"ResnetEncoder(num_input_images={self.num_input_images}) "
            f"expects {3 * self.num_input_images} input channels, got "
            f"{x.shape[-1]}")

        features = []
        if (self.normalize_input and not train
                and not self.is_initializing()
                and "batch_stats" in self.variables):
            # Fold (x - 0.45) / 0.225 into the stem conv + BN running
            # stats: the standalone normalize is a full-image elementwise
            # pass over a 3-channel (=125 wasted lanes) tensor, ~0.2 ms
            # at batch 16 on a v5e. conv((x-m)/s) = conv(x)/s - (m/s)*K(p)
            # where K(p)_c = sum of W[..., c] taps INSIDE the image at
            # output position p: the reference zero-pads the *normalized*
            # input, so border positions must only subtract the in-image
            # part of the kernel sum. K(p) = conv(ones, W); W is a traced
            # parameter (never closed over — PERF.md landmine #3), so
            # this extra stem conv runs per call — but at BATCH 1
            # regardless of input batch, so it amortizes to 1/N of one
            # stem conv. Net win over the standalone normalize pass
            # measured at batch 16 (PERF.md). Absorbed into the BN
            # affine; exact at inference everywhere (borders included);
            # params/tree untouched (importer-safe).
            p = self.variables["params"]["stem"]
            bs = self.variables["batch_stats"]["stem"]["bn"]
            w = p["conv"]["kernel"]                       # (7, 7, 3, 64)
            gamma, beta = p["bn"]["scale"], p["bn"]["bias"]
            mean, var = bs["mean"], bs["var"]
            z = jax.lax.conv_general_dilated(
                x, w, (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=x.dtype)
            kin = jax.lax.conv_general_dilated(
                jnp.ones((1,) + x.shape[1:], w.dtype), w, (2, 2),
                [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=x.dtype)           # (1, H', W', 64)
            a = gamma / (0.225 * jnp.sqrt(var + 1e-5))
            x = a * z + (beta - a * 0.225 * mean) - a * 0.45 * kin
        else:
            if self.normalize_input:
                x = (x - 0.45) / 0.225
            x = _ConvBN(64, 7, 2, name="stem")(x, train)
        features.append(jax.nn.relu(x))
        x = _max_pool_3x3_s2(features[-1])
        for stage in range(4):
            stride = 1 if stage == 0 else 2
            for b in range(blocks[stage]):
                x = block_cls(chans[stage + 1], stride if b == 0 else 1,
                              name=f"layer{stage + 1}_{b}")(x, train)
            features.append(x)
        return features

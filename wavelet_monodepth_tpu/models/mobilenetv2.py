"""MobileNetV2 encoder in flax, NHWC.

Rebuild of `KITTI/networks/encoders/mobilenetv2_encoder.py:80-164` (which
follows torchvision's MobileNetV2, minus the classifier and the last
[6,320,1,1] inverted-residual stage): features tapped at each stride-2
boundary, optional 1280-channel last 1x1 layer replacing the coarsest tap.
`num_ch_enc = [32, 24, 32, 64, 160]` (or 1280 last with use_last_layer).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray

# (expand_ratio t, channels c, repeats n, stride s) — mobilenetv2_encoder.py:97-105
_SETTINGS = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
             (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2))


def num_ch_enc(use_last_layer: bool = True) -> tuple[int, ...]:
    return (32, 24, 32, 64, 1280 if use_last_layer else 160)


def _relu6(x: Array) -> Array:
    return jnp.clip(x, 0.0, 6.0)


class _ConvBNReLU6(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        p = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    (self.stride, self.stride), padding=[(p, p), (p, p)],
                    feature_group_count=self.groups, use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        return _relu6(x) if self.relu else x


class InvertedResidual(nn.Module):
    features: int
    stride: int
    expand_ratio: int

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        y = x
        if self.expand_ratio != 1:
            y = _ConvBNReLU6(hidden, 1, name="expand")(y, train)
        y = _ConvBNReLU6(hidden, 3, self.stride, groups=hidden,
                         name="depthwise")(y, train)
        y = _ConvBNReLU6(self.features, 1, relu=False, name="project")(y, train)
        if self.stride == 1 and inp == self.features:
            return x + y
        return y


class MobileNetV2Encoder(nn.Module):
    use_last_layer: bool = True
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> list[Array]:
        c0 = int(32 * self.width_mult)
        feats = []
        x = _ConvBNReLU6(c0, 3, 2, name="stem")(x, train)
        feats.append(x)
        idx = 0
        for t, c, n, s in _SETTINGS:
            cout = int(c * self.width_mult)
            for rep in range(n):
                x = InvertedResidual(cout, s if rep == 0 else 1, t,
                                     name=f"block_{idx}")(x, train)
                idx += 1
                if s == 2 and rep == 0:
                    feats.append(x)
        if self.use_last_layer:
            feats[-1] = _ConvBNReLU6(1280, 1, name="last")(x, train)
        return feats

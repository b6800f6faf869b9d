"""DenseNet-161 encoder in flax, NHWC — the NYUv2 flagship backbone.

Rebuild of `NYUv2/networks/encoders/densenet_encoder.py:4-33`, which taps
torchvision densenet161.features at relu0 (H/2, 96), pool0 (H/4, 96),
transition1 (H/8, 192), transition2 (H/16, 384) and denseblock4 (H/32,
2208); `num_ch_enc = [96, 96, 192, 384, 2208]`. densenet161 config:
init_features 96, growth 48, bn_size 4, blocks (6, 12, 36, 24).

Input normalization: the reference's `normalize_input` is a SILENT NO-OP —
`t.sub(m).div(s)` is out-of-place and the result is discarded
(`densenet_encoder.py:27-29`; same bug in the NYU resnet/mobilenet
encoders), so every published NYU model consumed raw [0,1] inputs. We
default `normalize_input=False` to reproduce that effective behavior
(locked by tests/test_reference_parity.py::test_nyu_densenet_encoder_*);
True performs REAL ImageNet mean/std normalization — a documented
deviation for from-scratch training, never for reference checkpoints.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray

NUM_CH_ENC = (96, 96, 192, 384, 2208)
_MEAN = jnp.asarray([0.485, 0.456, 0.406])
_STD = jnp.asarray([0.229, 0.224, 0.225])


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class DenseLayer(nn.Module):
    growth_rate: int = 48
    bn_size: int = 4

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        y = jax.nn.relu(_BN(name="norm1")(x, train))
        y = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False,
                    name="conv1")(y)
        y = jax.nn.relu(_BN(name="norm2")(y, train))
        y = nn.Conv(self.growth_rate, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        y = jax.nn.relu(_BN(name="norm")(x, train))
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv")(y)
        return nn.avg_pool(y, (2, 2), (2, 2))


class DenseNet161Encoder(nn.Module):
    normalize_input: bool = False
    growth_rate: int = 48
    init_features: int = 96
    block_config: tuple = (6, 12, 36, 24)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> list[Array]:
        if self.normalize_input:
            # cast the f32 constants to the activation dtype: promoting
            # x to f32 here silently ran the whole encoder in f32 under
            # bf16 mixed precision (flax Conv promotes params up), then
            # crashed at the first explicit lax conv in the decoder
            x = (x - _MEAN.astype(x.dtype)) / _STD.astype(x.dtype)
        feats = []
        x = nn.Conv(self.init_features, (7, 7), (2, 2), padding=3,
                    use_bias=False, name="conv0")(x)
        x = jax.nn.relu(_BN(name="norm0")(x, train))
        feats.append(x)                                   # relu0, H/2
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])
        feats.append(x)                                   # pool0, H/4
        nch = self.init_features
        for bi, num_layers in enumerate(self.block_config):
            for li in range(num_layers):
                x = DenseLayer(self.growth_rate,
                               name=f"block{bi + 1}_layer{li + 1}")(x, train)
            nch += num_layers * self.growth_rate
            if bi != len(self.block_config) - 1:
                nch //= 2
                x = Transition(nch, name=f"transition{bi + 1}")(x, train)
                if bi < 2:
                    feats.append(x)                       # H/8, H/16 taps
        feats.append(x)                                   # denseblock4, H/32
        return feats

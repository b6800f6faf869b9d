"""Pose networks for monocular training.

TPU-native rebuilds of `KITTI/networks/decoders/pose_decoder.py:14-54`
(`PoseDecoder`: 1x1 squeeze -> three convs -> global mean ->
0.01 * (axisangle, translation)) and `KITTI/networks/pose_cnn.py:13-50`
(`PoseCNN`: 7-conv stride-2 stack with the same head). NHWC.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


class PoseDecoder(nn.Module):
    num_ch_enc: Sequence[int]
    num_input_features: int = 1
    num_frames_to_predict_for: int = 2
    stride: int = 1

    @nn.compact
    def __call__(self, input_features: Sequence[Sequence[Array]]):
        """input_features: list (len num_input_features) of encoder feature
        pyramids; only the coarsest map of each is used."""
        last = [f[-1] for f in input_features]
        # ONE squeeze conv shared across every input feature, like the
        # reference (`pose_decoder.py:26,38` applies convs["squeeze"]
        # in a loop) — per-feature weights would diverge from imported
        # checkpoints in the multi-feature 'shared' pose mode
        squeeze = nn.Conv(256, (1, 1), name="squeeze")
        cat = [jax.nn.relu(squeeze(f)) for f in last]
        out = jnp.concatenate(cat, axis=-1)
        out = jax.nn.relu(nn.Conv(256, (3, 3), (self.stride, self.stride),
                                  padding=1, name="pose_0")(out))
        out = jax.nn.relu(nn.Conv(256, (3, 3), (self.stride, self.stride),
                                  padding=1, name="pose_1")(out))
        out = nn.Conv(6 * self.num_frames_to_predict_for, (1, 1),
                      name="pose_2")(out)
        out = out.mean(axis=(1, 2))
        out = 0.01 * out.reshape(-1, self.num_frames_to_predict_for, 1, 6)
        return out[..., :3], out[..., 3:]


class PoseCNN(nn.Module):
    num_input_frames: int = 2

    @nn.compact
    def __call__(self, x: Array):
        specs = [(16, 7, 2), (32, 5, 2), (64, 3, 2), (128, 3, 2),
                 (256, 3, 2), (256, 3, 2), (256, 3, 2)]
        for i, (c, k, s) in enumerate(specs):
            x = nn.Conv(c, (k, k), (s, s), padding=(k - 1) // 2,
                        name=f"conv_{i}")(x)
            x = jax.nn.relu(x)
        x = nn.Conv(6 * (self.num_input_frames - 1), (1, 1),
                    name="pose_conv")(x)
        x = x.mean(axis=(1, 2))
        x = 0.01 * x.reshape(-1, self.num_input_frames - 1, 1, 6)
        return x[..., :3], x[..., 3:]

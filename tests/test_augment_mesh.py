"""uint8 device-augment feed under the 8-device data mesh: the u8
frames + per-item jitter params shard on the batch axis and the
in-step expansion (ops/augment.expand_batch) composes with GSPMD."""

import jax
import numpy as np
import pytest

from wavelet_monodepth_tpu.parallel import mesh as mesh_lib
from wavelet_monodepth_tpu.train.kitti import (KittiTrainSetup,
                                               synthetic_batch)
from wavelet_monodepth_tpu.utils.config import KittiOptions


def _u8_batch(opts, n):
    """Reshape a synthetic float batch into the device-augment item
    contract (data/kitti.py device_augment=True): uint8 frames trimmed
    to what the step reads, plus a per-item jitter vector."""
    b = synthetic_batch(opts, n)
    out = {k: v for k, v in b.items()
           if not (isinstance(k, tuple)
                   and k[0] in ("color", "color_aug"))}
    for k, v in b.items():
        if isinstance(k, tuple) and k[0] == "color":
            if str(k[1]) != "0" and k[2] > 0:
                continue                       # other frames: scale 0
            out[("color_u8", k[1], k[2])] = (
                np.asarray(v) * 255).astype(np.uint8)
    jit = np.tile(np.asarray([1.1, 0.9, 1.05, 0.02], np.float32),
                  (n, 1))
    out[("jitter",)] = jit
    return out


def test_u8_feed_data_parallel_8_devices():
    assert len(jax.devices()) == 8
    opts = KittiOptions(use_stereo=True, frame_ids=(0,), height=64,
                        width=96, use_wavelets=True, batch_size=8)
    setup = KittiTrainSetup(opts, steps_per_epoch=10)
    m = mesh_lib.make_mesh(data=8)
    state = mesh_lib.replicate(m, setup.init_state(jax.random.PRNGKey(0)))
    batch = mesh_lib.shard_batch(m, _u8_batch(opts, 8))
    state, losses = setup.jit_train_step()(state, batch,
                                           jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["loss"]))
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_u8_feed_mesh_matches_single_device():
    """Same u8 batch through the sharded and unsharded step from the
    same init: identical loss."""
    opts = KittiOptions(use_stereo=True, frame_ids=(0,), height=64,
                        width=96, use_wavelets=True, batch_size=8)
    setup = KittiTrainSetup(opts, steps_per_epoch=10)
    batch = _u8_batch(opts, 8)
    rng = jax.random.PRNGKey(1)
    _, l_single = setup.jit_train_step()(
        setup.init_state(jax.random.PRNGKey(0)), batch, rng)
    m = mesh_lib.make_mesh(data=8)
    _, l_mesh = setup.jit_train_step()(
        mesh_lib.replicate(m, setup.init_state(jax.random.PRNGKey(0))),
        mesh_lib.shard_batch(m, batch), rng)
    np.testing.assert_allclose(float(l_mesh["loss"]),
                               float(l_single["loss"]), rtol=1e-5)

"""Checkpoint round-trip, partial restore, metadata, opts, pose-eval and
config parsing tests."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from wavelet_monodepth_tpu.eval import pose_eval
from wavelet_monodepth_tpu.train.kitti import KittiTrainSetup, \
    synthetic_batch
from wavelet_monodepth_tpu.utils import checkpoint as ckpt
from wavelet_monodepth_tpu.utils.config import (KittiOptions, NyuOptions,
                                                load_opts,
                                                parse_kitti_args,
                                                save_opts)

TINY = dict(height=64, width=96, num_layers=18, batch_size=2)


def _tiny_setup():
    opts = KittiOptions(use_stereo=True, frame_ids=(0,),
                        use_depth_hints=True, use_wavelets=True, **TINY)
    return opts, KittiTrainSetup(opts, steps_per_epoch=10)


def test_checkpoint_roundtrip(tmp_path):
    opts, setup = _tiny_setup()
    state = setup.init_state(jax.random.PRNGKey(0))
    folder = ckpt.save_checkpoint(
        str(tmp_path), 3, state,
        meta={"height": 64, "width": 96, "use_stereo": 1}, opts=opts)
    assert os.path.basename(folder) == "weights_3"
    fresh = setup.init_state(jax.random.PRNGKey(42))
    restored = ckpt.load_checkpoint(folder, fresh)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    meta = ckpt.load_meta(folder)
    assert meta["height"] == 64 and meta["use_stereo"] == 1
    assert ckpt.latest_checkpoint(str(tmp_path)) == folder


def test_orbax_backend_roundtrip(tmp_path):
    """backend='orbax' writes an OCDBT directory; load_checkpoint
    auto-detects it (SURVEY §5.4: orbax-style checkpoint-resume is the
    TPU production path — multi-host / sharding-aware)."""
    opts, setup = _tiny_setup()
    state = setup.init_state(jax.random.PRNGKey(0))
    folder = ckpt.save_checkpoint(str(tmp_path), 1, state,
                                  backend="orbax")
    assert os.path.isdir(os.path.join(folder, "state.orbax"))
    fresh = setup.init_state(jax.random.PRNGKey(9))
    restored = ckpt.load_checkpoint(folder, fresh)
    for x, y in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert int(restored.step) == int(state.step)


def test_partial_restore(tmp_path):
    opts, setup = _tiny_setup()
    state = setup.init_state(jax.random.PRNGKey(0))
    folder = ckpt.save_checkpoint(str(tmp_path), 0, state)
    fresh = setup.init_state(jax.random.PRNGKey(7))
    params = ckpt.load_params_partial(folder, fresh.params,
                                      models_to_load=("encoder",))
    # encoder restored, depth left fresh
    enc_a = jax.tree_util.tree_leaves(state.params["encoder"])[0]
    enc_b = jax.tree_util.tree_leaves(params["encoder"])[0]
    np.testing.assert_array_equal(np.asarray(enc_a), np.asarray(enc_b))
    dep_fresh = jax.tree_util.tree_leaves(fresh.params["depth"])[0]
    dep_b = jax.tree_util.tree_leaves(params["depth"])[0]
    np.testing.assert_array_equal(np.asarray(dep_fresh), np.asarray(dep_b))


def test_opts_roundtrip(tmp_path):
    opts = KittiOptions(use_stereo=True, frame_ids=(0,), threshold=0.07)
    p = str(tmp_path / "opt.json")
    save_opts(opts, p)
    loaded = load_opts(KittiOptions, p)
    assert loaded.threshold == 0.07
    assert loaded.use_stereo and tuple(loaded.frame_ids) == (0,)


def test_parse_kitti_args():
    opts = parse_kitti_args(["--use_stereo", "--frame_ids", "0",
                             "--use_wavelets", "--height", "96",
                             "--scales", "0", "1"])
    assert opts.use_stereo and opts.use_wavelets
    assert opts.frame_ids == (0,) and opts.height == 96
    assert opts.scales == (0, 1)
    assert opts.all_frame_ids == (0, "s")
    assert not opts.use_pose_net


def test_pose_eval_ate():
    # straight-line GT; identical prediction -> ATE ~ 0
    n = 12
    gt = np.tile(np.eye(3, 4), (n, 1, 1))
    gt[:, 0, 3] = np.arange(n, dtype=np.float64)
    step = np.eye(4)
    step[0, 3] = 1.0
    # local pose convention from evaluate_pose.py: inv(inv(g[i-1]) g[i])
    pred = np.tile(np.linalg.inv(step), (n - 1, 1, 1))
    mean_ate, std_ate = pose_eval.evaluate_trajectory(pred, gt)
    assert mean_ate < 1e-9

    # wrong-scale prediction is forgiven by scale alignment
    pred_scaled = pred.copy()
    pred_scaled[:, 0, 3] *= 3.0
    mean_ate2, _ = pose_eval.evaluate_trajectory(pred_scaled, gt)
    assert mean_ate2 < 1e-9


def test_latest_checkpoint_skips_preempted_save(tmp_path):
    """A save killed before the atomic rename leaves weights_<n> with
    only state.msgpack.tmp — latest_checkpoint must fall back to the
    previous complete epoch instead of handing --auto_resume a
    truncated file."""
    opts, setup = _tiny_setup()
    state = setup.init_state(jax.random.PRNGKey(0))
    good = ckpt.save_checkpoint(str(tmp_path), 4, state)
    interrupted = os.path.join(str(tmp_path), "models", "weights_5")
    os.makedirs(interrupted)
    with open(os.path.join(interrupted, "state.msgpack.tmp"), "wb") as f:
        f.write(b"partial")
    assert ckpt.latest_checkpoint(str(tmp_path)) == good
    # no complete folder at all -> None
    os.remove(os.path.join(good, "state.msgpack"))
    assert ckpt.latest_checkpoint(str(tmp_path)) is None

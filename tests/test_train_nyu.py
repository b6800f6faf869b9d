"""NYU supervised train-step tests on tiny shapes (mobilenet encoder for
speed; densenet is covered by encoder tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelet_monodepth_tpu.train.nyu import NyuTrainSetup, depth_norm
from wavelet_monodepth_tpu.utils.config import NyuOptions


def _setup(**kw):
    opts = NyuOptions(encoder_type="mobilenet_light", use_wavelets=True,
                      **kw)
    setup = NyuTrainSetup(opts)
    # shrink the input for test speed
    setup.input_hw = (64, 96)
    setup.depth_hw = (32, 48)
    return setup


def test_nyu_train_step_runs_and_is_finite():
    setup = _setup()
    state = setup.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(2, 64, 96, 3), jnp.float32)
    depth = jnp.asarray(rng.rand(2, 32, 48, 1) * 990 + 10, jnp.float32)
    step = setup.jit_train_step()
    for i in range(2):
        state, losses = step(state, image, depth)
    assert np.isfinite(float(losses["loss"]))
    assert int(state.step) == 2
    assert "loss_depth/0" in losses
    # reference quirk preserved: DecoderWave logs LL at scale 2 while the
    # train loop supervises ("wavelets", 3, "LL") (NYUv2/train.py:318,
    # caught KeyError) -> no LL loss for the non-224 decoder
    assert "loss_LL3" not in losses


def test_nyu_supervise_ll_via_224_decoder():
    setup = _setup(supervise_LL=True, use_224=True)
    setup.input_hw = (64, 96)
    setup.depth_hw = (64, 96)
    state = setup.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    image = jnp.asarray(rng.rand(1, 64, 96, 3), jnp.float32)
    depth = jnp.asarray(rng.rand(1, 64, 96, 1) * 990 + 10, jnp.float32)
    outputs, _ = setup.forward(state.params, state.batch_stats, image,
                               train=False)
    losses = setup.compute_losses(outputs, depth)
    assert "loss_LL3" in losses
    manual = sum(float(losses[f"loss/{s}"]) for s in range(4)
                 if f"loss/{s}" in losses) + float(losses["loss_LL3"])
    np.testing.assert_allclose(float(losses["loss"]), manual, rtol=1e-4)


def test_depth_norm():
    d = jnp.asarray([[1.0, 2.0, 10.0]])
    np.testing.assert_allclose(np.asarray(depth_norm(d)),
                               [[10.0, 5.0, 1.0]])


def test_nyu_disparity_mode():
    setup = _setup(disparity=True)
    state = setup.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    image = jnp.asarray(rng.rand(1, 64, 96, 3), jnp.float32)
    depth = jnp.asarray(rng.rand(1, 32, 48, 1) * 5 + 1, jnp.float32)
    state, losses = setup.jit_train_step()(state, image, depth)
    assert np.isfinite(float(losses["loss"]))


def test_nyu_data_parallel_8_devices():
    import jax
    from wavelet_monodepth_tpu.parallel import mesh as mesh_lib

    assert len(jax.devices()) == 8
    setup = _setup()
    m = mesh_lib.make_mesh(data=8)
    state = mesh_lib.replicate(m, setup.init_state(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(3)
    sh = mesh_lib.batch_sharding(m)
    image = jax.device_put(
        jnp.asarray(rng.rand(8, 64, 96, 3), jnp.float32), sh)
    depth = jax.device_put(
        jnp.asarray(rng.rand(8, 32, 48, 1) * 990 + 10, jnp.float32), sh)
    state, losses = setup.jit_train_step()(state, image, depth)
    assert np.isfinite(float(losses["loss"]))
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_nyu_mixed_precision_train_step():
    setup = _setup()
    state = setup.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(2, 64, 96, 3), jnp.float32)
    depth = jnp.asarray(rng.rand(2, 32, 48, 1) * 990 + 10, jnp.float32)
    step = setup.jit_train_step(mixed_precision=True)
    for _ in range(2):
        state, losses = step(state, image, depth)
    assert np.isfinite(float(losses["loss"]))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32


def test_nyu_densenet_mixed_precision_runs_in_bf16():
    """DenseNet's f32 ImageNet mean/std constants silently promoted the
    whole encoder to f32 under mixed precision (flax Conv promotes
    params up), then crashed at the decoder's explicit lax conv.
    Regression: the densenet bf16-mp step must run, and its loss must
    track the f32 step closely."""
    opts = NyuOptions(encoder_type="densenet", use_wavelets=True)
    setup = NyuTrainSetup(opts)
    setup.input_hw = (64, 96)
    setup.depth_hw = (32, 48)
    state = setup.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 64, 96, 3), jnp.float32)
    depth = jnp.asarray(rng.rand(1, 32, 48, 1) * 990 + 10, jnp.float32)
    _, l_mp = setup.jit_train_step(mixed_precision=True)(
        setup.init_state(jax.random.PRNGKey(0)), image, depth)
    _, l_f32 = setup.jit_train_step(mixed_precision=False)(
        state, image, depth)
    a, b = float(l_mp["loss"]), float(l_f32["loss"])
    assert np.isfinite(a)
    assert abs(a - b) / abs(b) < 0.01


def test_bool_flags_can_be_disabled():
    """True-default bools need a --no- spelling (plain store_true can
    never turn them off); store_true usage stays reference-compatible."""
    from wavelet_monodepth_tpu.utils.config import (parse_kitti_args,
                                                    parse_nyu_args)
    o = parse_nyu_args(["--data_path", "x"])
    assert o.pretrained_encoder is True
    o = parse_nyu_args(["--data_path", "x", "--no-pretrained_encoder"])
    assert o.pretrained_encoder is False
    k = parse_kitti_args(["--data_path", "x", "--use_stereo"])
    assert k.use_stereo is True


def test_nyu_imagenet_init_guard_and_note(capsys):
    """pretrained_encoder without a local state_dict: scratch init with
    a note; an unsupported encoder with a path raises cleanly."""
    import jax

    from wavelet_monodepth_tpu.train.nyu import NyuTrainSetup
    from wavelet_monodepth_tpu.utils.config import NyuOptions

    opts = NyuOptions(encoder_type="mobilenet_light", use_wavelets=True,
                      use_224=True)
    setup = NyuTrainSetup(opts)
    setup.init_state(jax.random.PRNGKey(0))
    assert "no --imagenet_weights_path" in capsys.readouterr().out

    opts2 = NyuOptions(encoder_type="mobilenet_light", use_wavelets=True,
                       use_224=True, imagenet_weights_path="/tmp/x.pth")
    with pytest.raises(SystemExit, match="no mobilenet_light"):
        NyuTrainSetup(opts2).init_state(jax.random.PRNGKey(0))

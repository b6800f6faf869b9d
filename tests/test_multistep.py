"""K-steps-per-dispatch training (`--steps_per_call`,
train/kitti.py make_multi_train_step): the lax.scan multi-step program
must be numerically identical to K single-step dispatches — same RNG
split sequence, same optimizer/schedule stepping — and must shard under
the virtual 8-device data mesh with the stacked [K, B, ...] layout."""

import jax
import jax.numpy as jnp
import numpy as np

from wavelet_monodepth_tpu.data.loader import stack_batches
from wavelet_monodepth_tpu.parallel import mesh as mesh_lib
from wavelet_monodepth_tpu.train.kitti import KittiTrainSetup, \
    synthetic_batch
from wavelet_monodepth_tpu.utils.config import KittiOptions

TINY = dict(height=64, width=96, scales=(0, 1, 2, 3),
            loss_scales=(0, 1, 2, 3), num_layers=18, batch_size=2)


def _opts(**kw):
    merged = {**TINY, **kw}
    return KittiOptions(use_stereo=True, frame_ids=(0,),
                        use_depth_hints=True, use_wavelets=True,
                        **merged)


def test_multi_step_matches_single_steps():
    opts = _opts(steps_per_call=2)
    setup = KittiTrainSetup(opts, steps_per_epoch=10)
    b0 = synthetic_batch(opts, 2)
    # two DISTINCT sub-batches (dim the second's images) so a
    # mis-ordered scan shows up in the step-1 loss
    b1 = {k: (v * 0.9 if k[0] in ("color", "color_aug") else v)
          for k, v in b0.items()}
    stacked = jax.tree_util.tree_map(
        lambda a, c: jnp.stack([a, c]), b0, b1)
    R = jax.random.PRNGKey(7)

    # single-step path, mirroring the scan's internal split sequence
    # (donate_argnums invalidates the input state, so init twice)
    state_s = setup.init_state(jax.random.PRNGKey(0))
    step1 = setup.jit_train_step()
    r = R
    losses_seq = []
    for b in (b0, b1):
        r, sub = jax.random.split(r)
        state_s, losses = step1(state_s, b, sub)
        losses_seq.append(jax.device_get(losses))

    state_m = setup.init_state(jax.random.PRNGKey(0))
    multi = setup.jit_multi_train_step(2)
    state_m, mlosses = multi(state_m, stacked, R)
    mlosses = jax.device_get(mlosses)

    # the scan body compiles separately from the standalone step, so
    # fp reassociation bounds equality at ~1e-4 relative (measured
    # 5e-5); wiring errors (wrong rng/batch order/state threading)
    # show up at 1e-1 scale
    for i in (0, 1):
        np.testing.assert_allclose(mlosses["loss"][i],
                                   losses_seq[i]["loss"], rtol=1e-3)
    assert int(state_m.step) == int(state_s.step) == 2
    flat_s = jax.tree_util.tree_leaves(state_s.params)
    flat_m = jax.tree_util.tree_leaves(state_m.params)
    for a, b in zip(flat_s, flat_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_multi_step_sharded_on_mesh():
    opts = _opts(steps_per_call=2, batch_size=8)
    setup = KittiTrainSetup(opts, steps_per_epoch=10)
    state = setup.init_state(jax.random.PRNGKey(0))
    m = mesh_lib.make_mesh(data=8)
    state = mesh_lib.replicate(m, state)
    batch = synthetic_batch(opts, 8)
    s = mesh_lib.stacked_batch_sharding(m)
    stacked = jax.tree_util.tree_map(
        lambda a: jax.device_put(jnp.stack([a, a]), s), batch)
    multi = setup.jit_multi_train_step(2)
    state, losses = multi(state, stacked, jax.random.PRNGKey(1))
    out = jax.device_get(losses["loss"])
    assert out.shape == (2,) and np.all(np.isfinite(out))


def test_stack_batches_groups_and_drops_last():
    bs = [{("a",): np.full((2, 3), i), ("b", 0): np.arange(2) + i}
          for i in range(5)]
    out = list(stack_batches(iter(bs), 2))
    assert len(out) == 2                      # trailing odd batch dropped
    assert out[0][("a",)].shape == (2, 2, 3)
    assert out[1][("a",)][1, 0, 0] == 3
    assert out[1][("b", 0)].tolist() == [[2, 3], [3, 4]]

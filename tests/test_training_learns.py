"""Learning smoke test: with depth-hint proxy supervision, the hint loss
log(|gt - pred| + 1) must fall when overfitting one batch. Catches broken
gradients / optimizer wiring that shape tests can't see. (A pure
photometric signal on synthetic texture is too weak to move in a dozen
steps, so the supervised path is the smoke signal; the photometric path's
gradients are covered by test_gradients_flow_to_all_params.)"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from wavelet_monodepth_tpu.train.kitti import KittiTrainSetup
from wavelet_monodepth_tpu.utils.config import KittiOptions

H, W = 64, 96


def _stereo_scene():
    """Constant-disparity pair with the physical sign: a point at left
    pixel x appears in the right image at x - d, i.e.
    right(x) = left(x + d)."""
    rng = np.random.RandomState(0)
    tex = rng.rand(H, W * 2, 3).astype(np.float32)
    for _ in range(2):
        tex = (tex + np.roll(tex, 1, 0) + np.roll(tex, 1, 1)) / 3.0
    shift = 4
    left = tex[:, :W]
    right = tex[:, shift:shift + W]
    return left, right


def _inputs():
    left, right = _stereo_scene()
    inputs = {}
    for s in range(4):
        h, w = H // 2 ** s, W // 2 ** s
        li = cv2.resize(left, (w, h))
        ri = cv2.resize(right, (w, h))
        inputs[("color", "0", s)] = jnp.asarray(li)[None]
        inputs[("color_aug", "0", s)] = jnp.asarray(li)[None]
        inputs[("color", "s", s)] = jnp.asarray(ri)[None]
        inputs[("color_aug", "s", s)] = jnp.asarray(ri)[None]
        K = np.eye(4, dtype=np.float32)
        K[0, 0], K[1, 1] = 0.58 * w, 1.92 * h
        K[0, 2], K[1, 2] = 0.5 * w, 0.5 * h
        inputs[("K", s)] = jnp.asarray(K)[None]
        inputs[("inv_K", s)] = jnp.linalg.inv(jnp.asarray(K))[None]
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = -0.1
    inputs[("stereo_T",)] = jnp.asarray(T)[None]
    # GT depth for the constant-disparity scene: fx*B/shift_px
    fx = 0.58 * W
    depth_gt = fx * 0.1 / 4.0
    inputs[("depth_hint",)] = jnp.full((1, H, W, 1), depth_gt,
                                       jnp.float32)
    inputs[("depth_hint_mask",)] = jnp.ones((1, H, W, 1), jnp.float32)
    return inputs


def test_hint_supervised_loss_decreases():
    opts = KittiOptions(use_stereo=True, frame_ids=(0,),
                        use_depth_hints=True, use_wavelets=True,
                        height=H, width=W, num_layers=18, batch_size=1,
                        learning_rate=1e-4)
    setup = KittiTrainSetup(opts, steps_per_epoch=1000)
    state = setup.init_state(jax.random.PRNGKey(0))
    inputs = _inputs()
    step = setup.jit_train_step()

    hint0 = None
    hint = None
    for i in range(30):
        state, losses = step(state, inputs, jax.random.PRNGKey(i))
        hint = float(losses["depth_hint_loss/0"])
        if hint0 is None:
            hint0 = hint
        assert np.isfinite(float(losses["loss"]))
    assert hint < hint0 * 0.85, (
        f"hint loss did not decrease: {hint0:.4f} -> {hint:.4f}")

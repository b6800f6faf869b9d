"""Width crossover for the Pallas banded stereo warp: gather vs banded
on the full jitted KITTI stereo+hints train step at 640x192 / 832x256 /
1024x320, bf16-mp (the production dtype), batch 6, ONE window.

Context: the banded kernel measured 0.82-0.88x at 640x192 (PERF.md
round 3) but 2.4-2.8x at 1024x320 — the XLA gather degrades
super-linearly in width. This locates the crossover for the
stereo_warp_kernel='auto' default.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

K1, K2 = 2, 12
B = 6
SHAPES = ((192, 640), (256, 832), (320, 1024))


def main():
    global SHAPES
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=0,
                    help="restrict to one shape (pairs with --height)")
    ap.add_argument("--height", type=int, default=0)
    a = ap.parse_args()
    if a.width:
        SHAPES = ((a.height, a.width),)

    from wavelet_monodepth_tpu.train.kitti import (KittiTrainSetup,
                                                   synthetic_batch)
    from wavelet_monodepth_tpu.utils.config import KittiOptions

    configs = []
    for h, w in SHAPES:
        for kern in (True, False):
            opts = KittiOptions(use_stereo=True, frame_ids=(0,),
                                use_depth_hints=True, use_wavelets=True,
                                num_layers=18, height=h, width=w,
                                batch_size=B, stereo_warp_kernel=kern)
            setup = KittiTrainSetup(opts, steps_per_epoch=1000)
            batch = synthetic_batch(opts, B)
            step = setup.make_train_step(True)   # bf16-mp

            @functools.partial(jax.jit, static_argnames="k")
            def chained(state, k, step=step, batch=batch):
                def body(i, st):
                    new_st, _ = step(st, batch, jax.random.PRNGKey(0))
                    return new_st
                out = jax.lax.fori_loop(0, k, body, state)
                leaf = jax.tree_util.tree_leaves(out.params)[0]
                return leaf.astype(jnp.float32).sum()

            tag = f"{w}x{h}_{'pallas' if kern else 'gather'}"
            configs.append((tag, setup, chained))

    for tag, setup, chained in configs:
        print(f"compiling {tag}...", flush=True)
        for k in (K1, K2):
            st = setup.init_state(jax.random.PRNGKey(0))
            float(chained(st, k))

    print("measuring (one window)...", flush=True)
    for tag, setup, chained in configs:
        def t(k):
            ts = []
            for _ in range(2):
                st = setup.init_state(jax.random.PRNGKey(0))
                t0 = time.perf_counter()
                float(chained(st, k))
                ts.append(time.perf_counter() - t0)
            return min(ts)
        ms = 1e3 * (t(K2) - t(K1)) / (K2 - K1)
        print(f"{tag}: {ms:7.2f} ms/step  ({B / ms * 1e3:6.1f} imgs/s)",
              flush=True)


if __name__ == "__main__":
    main()

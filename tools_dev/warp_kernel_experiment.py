"""Same-window A/B: Pallas banded stereo warp (ops/warp.py) vs the XLA
gather warp, on the full jitted KITTI stereo+hints train step
(640x192, batch 12, f32 and bf16-mp). Slope method with params-dependent
fetch (see tools_dev/train_perf_experiment.py for the traps)."""
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

K1, K2 = 2, 20
B = 12


def main():
    global B
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--batch", type=int, default=B)
    ap.add_argument("--mono_stereo", action="store_true",
                    help="M+S config: pose frames (-1, 1) + stereo; the "
                         "pose warps always take the gather path, so "
                         "pallas-vs-gather isolates the stereo warps' "
                         "share")
    a = ap.parse_args()
    B = a.batch

    from wavelet_monodepth_tpu.train.kitti import (KittiTrainSetup,
                                                   synthetic_batch)
    from wavelet_monodepth_tpu.utils.config import KittiOptions

    frames = (0, -1, 1) if a.mono_stereo else (0,)
    base = dict(use_stereo=True, frame_ids=frames,
                use_depth_hints=not a.mono_stereo,
                use_wavelets=True, num_layers=18, height=a.height,
                width=a.width, batch_size=B)
    configs = []
    for mp in (False, True):
        for kern in (True, False):
            opts = KittiOptions(stereo_warp_kernel=kern, **base)
            setup = KittiTrainSetup(opts, steps_per_epoch=1000)
            batch = synthetic_batch(opts, B)
            step = setup.make_train_step(mp)

            @functools.partial(jax.jit, static_argnames="k")
            def chained(state, k, step=step, batch=batch):
                def body(i, st):
                    new_st, _ = step(st, batch, jax.random.PRNGKey(0))
                    return new_st
                out = jax.lax.fori_loop(0, k, body, state)
                leaf = jax.tree_util.tree_leaves(out.params)[0]
                return leaf.astype(jnp.float32).sum()

            tag = f"{'bf16mp' if mp else 'f32'}_{'pallas' if kern else 'gather'}"
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

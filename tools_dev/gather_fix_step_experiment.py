"""Same-window A/B of the gather-cliff fix (batch-chunked flat take,
ops/image.py _TAKE_OPERAND_MAX_BYTES) on the full jitted KITTI train
step. Two variants of the SAME step — threshold disabled (one flat
take, the pre-fix program) vs enabled (chunked takes) — compiled
side by side and slope-measured in one window.

Configs of interest:
  --width 640  --height 192 --batch 12            (production stereo)
  --width 1024 --height 320 --batch 6 --mono_stereo  (published M+S —
      the pose-frame warps are gather-only and sit past the cliff)
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


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--mono_stereo", action="store_true")
    ap.add_argument("--dtypes", type=str, default="f32,bf16mp")
    a = ap.parse_args()
    B = a.batch

    from wavelet_monodepth_tpu.ops import image as image_mod
    from wavelet_monodepth_tpu.train.kitti import (KittiTrainSetup,
                                                   synthetic_batch)
    from wavelet_monodepth_tpu.utils.config import KittiOptions

    fixed_threshold = image_mod._TAKE_OPERAND_MAX_BYTES
    frames = (0, -1, 1) if a.mono_stereo else (0,)
    base = dict(use_stereo=True, frame_ids=frames,
                use_depth_hints=not a.mono_stereo,
                use_wavelets=True, num_layers=18, height=a.height,
                width=a.width, batch_size=B,
                stereo_warp_kernel=False)  # isolate the gather path

    configs = []
    for mp in (True, False):
        if ("bf16mp" if mp else "f32") not in a.dtypes.split(","):
            continue
        for thresh in (1 << 62, fixed_threshold):
            opts = KittiOptions(**base)
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

            tag = (f"{'bf16mp' if mp else 'f32'}_"
                   f"{'flat' if thresh > (1 << 61) else 'chunked'}")
            # the threshold is read at TRACE time: set it, then compile
            # both k-variants before moving on
            print(f"compiling {tag}...", flush=True)
            image_mod._TAKE_OPERAND_MAX_BYTES = thresh
            for k in (K1, K2):
                st = setup.init_state(jax.random.PRNGKey(0))
                float(chained(st, k))
            image_mod._TAKE_OPERAND_MAX_BYTES = fixed_threshold
            configs.append((tag, setup, chained))

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

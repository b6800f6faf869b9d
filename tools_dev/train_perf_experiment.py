"""Training throughput on one v5e: KITTI stereo+hints jitted train step
(the published config, 640x192, batch 12) — f32 vs bf16 mixed precision.
Slope-measured (serialized by threading the state through iterations)."""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# K2-K1 must be large enough that K2-K1 step-bodies (~80-200 ms each)
# dwarf the per-fetch relay-sync noise (~0.2-0.5 s) — K=5 measured a
# NEGATIVE slope once. 18 extra steps ~ 1.5-4 s of device time.
K1, K2 = 2, 20


def main():
    from wavelet_monodepth_tpu.train.kitti import (KittiTrainSetup,
                                                   synthetic_batch)
    from wavelet_monodepth_tpu.utils.config import KittiOptions

    B = 12
    opts = KittiOptions(use_stereo=True, frame_ids=(0,),
                        use_depth_hints=True, use_wavelets=True,
                        num_layers=18, height=192, width=640,
                        batch_size=B)
    setup = KittiTrainSetup(opts, steps_per_epoch=1000)
    batch = synthetic_batch(opts, B)
    res = {}

    for name, mp in (("train_f32", False), ("train_bf16_mp", True)):
        step = setup.make_train_step(mp)

        @functools.partial(jax.jit, static_argnames="k")
        def chained(state, k):
            def body(i, st):
                new_st, _ = step(st, batch, jax.random.PRNGKey(0))
                return new_st
            out = jax.lax.fori_loop(0, k, body, state)
            # the fetched value must depend on the PARAMS, not just the
            # step counter — returning .step alone lets XLA dead-carry
            # eliminate the entire loop body (measured: 0.03 ms/step)
            leaf = jax.tree_util.tree_leaves(out.params)[0]
            return leaf.astype(jnp.float32).sum()

        def t(k):
            ts = []
            for _ in range(2):
                state = setup.init_state(jax.random.PRNGKey(0))
                float(chained(state, k))        # warm (compiled once)
                state = setup.init_state(jax.random.PRNGKey(0))
                t0 = time.perf_counter()
                float(chained(state, k))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        try:
            state = setup.init_state(jax.random.PRNGKey(0))
            float(chained(state, K1))           # compile
            per_step = (t(K2) - t(K1)) / (K2 - K1)
            res[name] = {"ms_per_step": round(per_step * 1e3, 2),
                         "imgs_per_sec": round(B / per_step, 1)}
        except Exception as e:
            res[name] = f"ERR {type(e).__name__}: {str(e)[:120]}"
        print(name, res[name], flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()

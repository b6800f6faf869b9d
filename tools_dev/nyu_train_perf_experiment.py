"""NYU supervised train-step throughput on one v5e: DenseNet161 wavelet
decoder, 640x480, batch 8 (the published config). Slope method with a
params-dependent fetch (see train_perf_experiment.py for the dead-carry
trap)."""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

K1, K2 = 2, 18


def main():
    from wavelet_monodepth_tpu.train.nyu import NyuTrainSetup
    from wavelet_monodepth_tpu.utils.config import NyuOptions

    B = 8
    opts = NyuOptions(encoder_type="densenet", use_wavelets=True,
                      batch_size=B)
    setup = NyuTrainSetup(opts)
    rng = jax.random.PRNGKey(0)
    image = jax.random.uniform(rng, (B, 480, 640, 3), jnp.float32)
    depth = jax.random.uniform(rng, (B, 240, 320, 1), jnp.float32) \
        * 990 + 10
    res = {}

    for name, mp in (("nyu_f32", False), ("nyu_bf16_mp", True)):
        step = setup.make_train_step(mp)

        @functools.partial(jax.jit, static_argnames="k")
        def chained(state, k):
            def body(i, st):
                new_st, _ = step(st, image, depth)
                return new_st
            out = jax.lax.fori_loop(0, k, body, state)
            leaf = jax.tree_util.tree_leaves(out.params)[0]
            return leaf.astype(jnp.float32).sum()

        def t(k):
            ts = []
            for _ in range(3):
                state = setup.init_state(jax.random.PRNGKey(0))
                float(chained(state, k))
                state = setup.init_state(jax.random.PRNGKey(0))
                t0 = time.perf_counter()
                float(chained(state, k))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        try:
            state = setup.init_state(jax.random.PRNGKey(0))
            float(chained(state, K1))
            per_step = (t(K2) - t(K1)) / (K2 - K1)
            res[name] = {"ms_per_step": round(per_step * 1e3, 2),
                         "imgs_per_sec": round(B / per_step, 1)}
        except Exception as e:
            res[name] = f"ERR {type(e).__name__}: {str(e)[:140]}"
        print(name, res[name], flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()

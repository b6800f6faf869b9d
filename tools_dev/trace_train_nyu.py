"""Device-trace the NYU train step (DenseNet161 wavelet, 480x640, b8)
and attribute per-module time."""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from wavelet_monodepth_tpu.tools.profile_device import attribute


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
    state = setup.init_state(jax.random.PRNGKey(0))
    step = setup.jit_train_step()

    hlo = jax.jit(setup.make_train_step()).lower(
        state, image, depth).compile().as_text()

    iters = 8
    st, _ = step(state, image, depth)
    jax.block_until_ready(st.params)
    trace_dir = "/tmp/wmd_nyu_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            st, _ = step(st, image, depth)
        jax.block_until_ready(st.params)
    traces = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    total, groups = attribute(traces[-1], hlo, iters=iters, depth=2)
    print(f"total device ms/step: {total:.2f}")
    for g, ms in groups[:30]:
        print(f"{ms:9.3f}  {g}")


if __name__ == "__main__":
    main()

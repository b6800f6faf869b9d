"""Device-trace the KITTI train step (stereo+hints, batch 12, 640x192)
and attribute per-module time. The slope harness measured ~250 ms/step —
~38x the traced 6.7 ms forward — so something besides fwd+bwd dominates.
"""
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from wavelet_monodepth_tpu.tools.profile_device import (
    attribute, collect_trace)


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
    state = setup.init_state(jax.random.PRNGKey(0))
    step = setup.jit_train_step()
    rng = jax.random.PRNGKey(1)

    def run(state):
        st, losses = step(state, batch, rng)
        return st, losses

    lowered = jax.jit(lambda s: step(s, batch, rng)).lower(state)
    hlo = lowered.compile().as_text()

    iters = 8
    st = state
    st, _ = run(st)           # compile
    jax.block_until_ready(st.params)
    trace_dir = "/tmp/wmd_train_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            st, _ = run(st)
        jax.block_until_ready(st.params)
    import glob
    traces = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    total, groups = attribute(traces[-1], hlo, iters=iters, depth=2)
    print(f"total device ms/step: {total:.2f}")
    for g, ms in groups[:40]:
        print(f"{ms:9.3f}  {g}")


if __name__ == "__main__":
    main()

"""Batch-1 serving latency (VERDICT r2 #8): slope-measured device time
for single-image inference — the reference's serving shape
(`test_simple.py`; batch-1 asserts at `depth_decoder.py:297`) — at
640x192 and 1024x320, dense vs masked-sparse, bf16.

The ~0.13 ms relay dispatch floor makes naive batch-1 timing unusable
here (PERF.md); K chained evals in one jit amortize it away. The
spatially-sharded 1024x320 batch-1 path needs >1 chip (this machine has
one) — it is compile-validated by dryrun_multichip; the single-chip
number below is its baseline.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

K0, K1 = 2, 34
DENSITY = 0.10


def main():
    import jax
    import jax.numpy as jnp

    from wavelet_monodepth_tpu.models.decoders_kitti import \
        KittiWaveletDecoder
    from wavelet_monodepth_tpu.models.resnet import (ResnetEncoder,
                                                     num_ch_enc)
    from wavelet_monodepth_tpu.utils import maskgen as mg

    rng = jax.random.PRNGKey(0)
    encoder = ResnetEncoder(num_layers=18)
    decoder = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))

    jobs = []
    for (h, w) in ((192, 640), (320, 1024)):
        disp = mg.synthetic_depth_scene(1, h, w, seed=0)
        masks_np, ratio, _ = mg.masks_at_density(disp, DENSITY)
        x = jnp.asarray(mg.scene_image(disp, seed=0)).astype(jnp.bfloat16)
        masks = {i: jnp.asarray(m) for i, m in masks_np.items()}
        ev = encoder.init(rng, x.astype(jnp.float32))
        dv = decoder.init(rng, encoder.apply(ev, x.astype(jnp.float32)))
        ev = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), ev)
        dv = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), dv)

        @functools.partial(jax.jit, static_argnames=("k", "mode"))
        def chained(ev, dv, img, mo, k, mode, ratio=ratio):
            def body(i, carry):
                img_i = img + (carry * 1e-9).astype(img.dtype)
                feats = encoder.apply(ev, img_i)
                if mode == "dense":
                    d = decoder.apply(dv, feats)[("disp", 0)]
                else:
                    d = decoder.apply(dv, feats, thresh_ratio=ratio,
                                      mask_override=mo)[("disp", 0)]
                return carry + d.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        for mode in ("dense", "edge"):
            jobs.append((f"{h}x{w}_{mode}_bf16_b1", chained,
                         (ev, dv, x, masks), mode))

    for tag, ch, args, mode in jobs:
        print(f"compiling {tag}...", flush=True)
        float(ch(*args, K0, mode))
        float(ch(*args, K1, mode))

    print("measuring (one window)...", flush=True)
    for tag, ch, args, mode in jobs:
        def t(k):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(ch(*args, k, mode))
                ts.append(time.perf_counter() - t0)
            return min(ts)
        ms = 1e3 * (t(K1) - t(K0)) / (K1 - K0)
        print(f"{tag}: {ms:7.3f} ms/image", flush=True)


if __name__ == "__main__":
    main()

"""Same-window A/B: polyphase upsample+conv folding vs the original
composition, whole-net KITTI R18 640x192 batch 16, dense + masked
sparse (edge masks @10%), bf16 and f32. Slope method (see bench.py).

Run on the TPU: nohup python tools_dev/polyphase_experiment.py > log &
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BATCH = 16
H, W = 192, 640
DENSITY = 0.10
K0, K1 = 1, 9


def main():
    global BATCH, H, W
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=H)
    ap.add_argument("--width", type=int, default=W)
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--dtype", choices=("both", "bf16", "f32"),
                    default="both")
    a = ap.parse_args()
    H, W, BATCH = a.height, a.width, a.batch

    import jax
    import jax.numpy as jnp

    from wavelet_monodepth_tpu.models.decoders_kitti import \
        KittiWaveletDecoder
    from wavelet_monodepth_tpu.models.resnet import (ResnetEncoder,
                                                     num_ch_enc)
    from wavelet_monodepth_tpu.utils import maskgen as mg

    rng = jax.random.PRNGKey(0)
    encoder = ResnetEncoder(num_layers=18)
    dec_on = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18),
                                 use_polyphase=True)
    dec_off = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18),
                                  use_polyphase=False)

    disp = mg.synthetic_depth_scene(BATCH, H, W, seed=0)
    masks_np, ratio, _ = mg.masks_at_density(disp, DENSITY)
    x = jnp.asarray(mg.scene_image(disp, seed=0))
    masks = {i: jnp.asarray(m) for i, m in masks_np.items()}

    x1 = x[:1]
    enc_vars = encoder.init(rng, x1)
    dec_vars = dec_on.init(rng, encoder.apply(enc_vars, x1))

    def make_chained(dec):
        @functools.partial(jax.jit, static_argnames=("k", "mode"))
        def chained(ev, dv, img, mo, k, mode):
            def body(i, carry):
                img_i = img + (carry * 1e-9).astype(img.dtype)
                feats = encoder.apply(ev, img_i)
                if mode == "dense":
                    d = dec.apply(dv, feats)[("disp", 0)]
                else:
                    d = dec.apply(dv, feats, thresh_ratio=ratio,
                                  mask_override=mo)[("disp", 0)]
                return carry + d.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return chained

    ch_on, ch_off = make_chained(dec_on), make_chained(dec_off)

    def spf(ch, ev, dv, img, mode, reps=3):
        args = (ev, dv, img, masks)
        float(ch(*args, K0, mode))
        float(ch(*args, K1, mode))

        def t(k):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(ch(*args, k, mode))
                ts.append(time.perf_counter() - t0)
            return min(ts)
        return (t(K1) - t(K0)) / (K1 - K0) / BATCH

    evb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                 enc_vars)
    dvb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                 dec_vars)
    xb = x.astype(jnp.bfloat16)

    # compile all 8 configs first, then measure interleaved in one window
    configs = []
    dtyped = [("bf16", evb, dvb, xb), ("f32", enc_vars, dec_vars, x)]
    if a.dtype != "both":
        dtyped = [d for d in dtyped if d[0] == a.dtype]
    for dtype, ev, dv, img in dtyped:
        for name, ch in (("poly", ch_on), ("orig", ch_off)):
            for mode in ("dense", "edge"):
                configs.append((f"{dtype}_{name}_{mode}", ch, ev, dv,
                                img, mode))
    for tag, ch, ev, dv, img, mode in configs:
        print(f"compiling {tag}...", flush=True)
        float(ch(ev, dv, img, masks, K0, mode))
        float(ch(ev, dv, img, masks, K1, mode))

    print("measuring (one window)...", flush=True)
    for tag, ch, ev, dv, img, mode in configs:
        s = spf(ch, ev, dv, img, mode)
        print(f"{tag}: {1e3 * s:7.3f} ms/frame  {1.0 / s:7.1f} fps",
              flush=True)


if __name__ == "__main__":
    main()

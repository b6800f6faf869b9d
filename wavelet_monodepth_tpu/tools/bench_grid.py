"""Benchmark grid over the published configs (BASELINE.md rows):
KITTI R18/R50 x 640x192/1024x320 and NYU DenseNet161 640x480,
dense vs masked-sparse, f32 vs bf16 — slope-measured device time
(the method validated against jax.profiler traces, PERF.md "traced"),
--windows independent measurement windows per variant (median +
[min, max] reported; shared-tenancy swings absolute numbers 2-4x).

Emits one JSON line per (config, variant) and a final summary line.
Expected runtime: tens of minutes (every variant is a fresh remote
XLA compile). Run manually; bench.py remains the driver's fast entry.

  python -m wavelet_monodepth_tpu.tools.bench_grid [--batch 16]
      [--threshold 0.2] [--configs kitti_r18_640x192 ...] [--out path]
"""

from __future__ import annotations

import argparse
import functools
import json


CONFIGS = {
    "kitti_r18_640x192": dict(kind="kitti", layers=18, h=192, w=640),
    "kitti_r50_640x192": dict(kind="kitti", layers=50, h=192, w=640),
    "kitti_r18_1024x320": dict(kind="kitti", layers=18, h=320, w=1024),
    "kitti_r50_1024x320": dict(kind="kitti", layers=50, h=320, w=1024),
    "nyu_dense161_640x480": dict(kind="nyu", layers=161, h=480, w=640),
}


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..models.decoders_kitti import KittiWaveletDecoder
    from ..models.decoders_nyu import NyuDecoderWave
    from ..models.densenet import DenseNet161Encoder
    from ..models.resnet import ResnetEncoder, num_ch_enc
    from ..ops.sparse import compute_density
    from ..utils.precision import cast_floats

    p = argparse.ArgumentParser(description="bench grid")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--threshold", type=float, default=0.2)
    p.add_argument("--nyu_threshold", type=float, default=0.05)
    p.add_argument("--k0", type=int, default=1)
    p.add_argument("--k1", type=int, default=9)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--windows", type=int, default=3,
                   help="independent measurement windows per variant; "
                        "rows report median + [min, max] spread (device "
                        "tenancy swings absolute numbers 2-4x, PERF.md)")
    p.add_argument("--configs", nargs="+", default=list(CONFIGS))
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    results = []

    from ..utils.timing import slope_time

    def slope_windows(fn):
        import statistics
        vals = [slope_time(fn, args.k0, args.k1, reps=args.reps)
                for _ in range(args.windows)]
        return statistics.median(vals), min(vals), max(vals)

    from ..utils import maskgen as mg

    for name in args.configs:
        cfg = CONFIGS[name]
        rng = jax.random.PRNGKey(0)
        masks = None
        if cfg["kind"] == "kitti":
            encoder = ResnetEncoder(num_layers=cfg["layers"])
            decoder = KittiWaveletDecoder(
                num_ch_enc=num_ch_enc(cfg["layers"]))
            # the trained-model operating point: edge-structured masks
            # from the true DWT of synthetic scenes (see bench.py)
            disp = mg.synthetic_depth_scene(args.batch, cfg["h"],
                                            cfg["w"], seed=0)
            masks_np, thresh, _ = mg.masks_at_density(disp, 0.10)
            masks = {i: jnp.asarray(m) for i, m in masks_np.items()}
            x = jnp.asarray(mg.scene_image(disp, seed=0))
        else:
            encoder = DenseNet161Encoder()
            decoder = NyuDecoderWave(
                num_ch_enc=(96, 96, 192, 384, 2208))
            thresh = args.nyu_threshold
            x = jax.random.uniform(rng, (args.batch, cfg["h"],
                                         cfg["w"], 3), jnp.float32)
        x1 = x[:1]
        ev = encoder.init(rng, x1)
        dv = decoder.init(rng, encoder.apply(ev, x1))

        def make_chained(ev_, dv_, img, th):
            # variables/image/masks are jit ARGUMENTS, not closed-over
            # constants: constants are serialized into the remote-compile
            # request body (f32 DenseNet161 ~115 MB -> the relay's HTTP
            # 413 body limit; the round-4 grid's NYU f32 holes) and cost
            # ~1.3 ms per execution on this backend (CLAUDE.md/PERF.md).
            sparse = th is not None
            with_masks = sparse and masks is not None
            @functools.partial(jax.jit, static_argnames=("k",))
            def chained(ev_a, dv_a, img_a, masks_a, k):
                def body(i, carry):
                    xi = img_a + (carry * 1e-9).astype(img_a.dtype)
                    feats = encoder.apply(ev_a, xi)
                    if not sparse:
                        out = decoder.apply(dv_a, feats)
                    elif with_masks:
                        out = decoder.apply(dv_a, feats, thresh_ratio=th,
                                            mask_override=masks_a)
                    else:
                        out = decoder.apply(dv_a, feats, thresh_ratio=th)
                    return carry + out[("disp", 0)].sum().astype(
                        jnp.float32)
                import jax.lax as lax
                return lax.fori_loop(0, k, body, jnp.float32(0.0))
            m_arg = masks if with_masks else {}
            return lambda k: float(chained(ev_, dv_, img, m_arg, k=k))

        variants = {
            "dense_f32": (ev, dv, x, None),
            "sparse_f32": (ev, dv, x, thresh),
            "dense_bf16": (cast_floats(ev, jnp.bfloat16),
                           cast_floats(dv, jnp.bfloat16),
                           x.astype(jnp.bfloat16), None),
            "sparse_bf16": (cast_floats(ev, jnp.bfloat16),
                            cast_floats(dv, jnp.bfloat16),
                            x.astype(jnp.bfloat16), thresh),
        }

        @jax.jit
        def density_of(ev_, dv_):
            if masks is not None:
                out = decoder.apply(dv_, encoder.apply(ev_, x),
                                    thresh_ratio=thresh,
                                    mask_override=masks)
            else:
                out = decoder.apply(dv_, encoder.apply(ev_, x),
                                    thresh_ratio=thresh)
            return compute_density(out)

        dens = float(density_of(ev, dv))

        row = {"config": name, "batch": args.batch, "density": round(
            dens, 4), "threshold": thresh}
        for vname, (ev_, dv_, img, th) in variants.items():
            try:
                med, lo, hi = slope_windows(make_chained(ev_, dv_, img,
                                                         th))
                row[vname + "_us_per_frame"] = round(
                    med / args.batch * 1e6, 2)
                row[vname + "_us_minmax"] = [
                    round(lo / args.batch * 1e6, 2),
                    round(hi / args.batch * 1e6, 2)]
            except Exception as e:     # noqa: BLE001 — record and move on
                row[vname + "_error"] = f"{type(e).__name__}: {e}"[:200]
            print(json.dumps({k: row[k] for k in row}), flush=True)
        row["sparse_over_dense_f32"] = (
            round(row["dense_f32_us_per_frame"]
                  / row["sparse_f32_us_per_frame"], 3)
            if "sparse_f32_us_per_frame" in row else None)
        results.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps({"grid": results}), flush=True)


if __name__ == "__main__":
    main()

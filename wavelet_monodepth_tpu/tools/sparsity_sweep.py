"""Sparsity sweep — the score-vs-latency curve, as a one-command artifact
(the reference's `KITTI/sparsity_test_notebook.ipynb` /
`NYUv2/sparsity_test_notebook.ipynb`, upgraded with device-time latency).

Weight sources (--weights, repeatable):
  random      fresh init — the round-1 continuity point (spatially white
              masks; NOT the method's operating point, kept for scale)
  synthetic   fresh init + --train_steps supervised steps on maskgen's
              piecewise-smooth synthetic scenes, so the thresholded
              coefficients concentrate on depth edges like a trained
              model's (utils/maskgen.py rationale) — and the sweep gains
              a real score axis (abs_rel vs the synthetic GT disparity)
  torch       a reference checkpoint via --torch_model_path — the day
              real weights are mounted, the published curve
              (`README.md:103-108`) is this one flag

Mask families per weight source:
  * threshold sweep (--thresholds): the decoder's own thresholded
    coefficients — the notebooks' x-axis
  * edge-mask sweep (--densities): maskgen operating-point masks
    bisected to exact aggregate densities — the trained-model mask
    geometry bench.py measures

Latency is slope-measured device time (K serialized evals in one jit,
difference quotient): on this relay-attached TPU, block_until_ready does
not await execution and naive timings are wrong (PERF.md). Works on CPU
too (tests use it).

Output: one JSON with meta + rows; plot with tools/plot_sparsity_curve.

Usage:
  python -m wavelet_monodepth_tpu.tools.sparsity_sweep \
      --weights random synthetic --out artifacts/sparsity_curve.json
"""

from __future__ import annotations

import argparse
import json

from ..utils.timing import slope_time as _slope


def main(argv=None):
    import functools
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:  # persistent compile cache — repeat windows skip remote compiles
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser(
            os.environ.get("WMD_JAX_CACHE", "~/.cache/wmd_jax_cache")))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from ..models.decoders_kitti import KittiWaveletDecoder
    from ..models.resnet import ResnetEncoder, num_ch_enc
    from ..ops.sparse import compute_density
    from ..utils import maskgen as mg

    p = argparse.ArgumentParser(description="score-vs-latency sweep")
    p.add_argument("--dataset", choices=["kitti", "nyu"], default="kitti",
                   help="nyu sweeps DecoderWave (the NYUv2 notebook); "
                        "--torch_model_path is then the model.pth file")
    p.add_argument("--weights", nargs="+", default=["random", "synthetic"],
                   choices=["random", "synthetic", "torch"])
    p.add_argument("--torch_model_path", type=str, default=None)
    p.add_argument("--image", type=str, default=None,
                   help="score on a real image instead of synthetic "
                        "scenes (no GT axis)")
    p.add_argument("--num_layers", type=int, default=18)
    p.add_argument("--encoder_type", default="densenet",
                   choices=["densenet", "mobilenet_light"],
                   help="NYU encoder (--dataset nyu)")
    p.add_argument("--height", type=int, default=None,
                   help="default 192 (kitti) / 480 (nyu)")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--thresholds", nargs="+", type=float,
                   default=[-1, 0.01, 0.02, 0.05, 0.1, 0.2])
    p.add_argument("--densities", nargs="+", type=float,
                   default=[0.05, 0.10, 0.20, 0.35])
    p.add_argument("--train_steps", type=int, default=300,
                   help="supervised steps for --weights synthetic")
    p.add_argument("--bfloat16", action="store_true",
                   help="sweep in bf16 (the TPU serving dtype)")
    p.add_argument("--k", nargs=2, type=int, default=(2, 18),
                   metavar=("K0", "K1"), help="slope-method eval counts")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)
    if args.height is None:
        args.height = 192 if args.dataset == "kitti" else 480
    if args.width is None:
        args.width = 640
    if args.torch_model_path and "torch" not in args.weights:
        # a checkpoint path is an unambiguous ask — don't silently
        # measure random weights instead
        print("note: --torch_model_path given; adding 'torch' to "
              "--weights")
        args.weights = list(args.weights) + ["torch"]
    if "torch" in args.weights:
        # fail fast, before any model build / device contact
        if not args.torch_model_path:
            raise SystemExit("--weights torch needs --torch_model_path")
        if args.dataset == "nyu" and args.encoder_type != "densenet":
            raise SystemExit(
                "--weights torch on NYU supports only --encoder_type "
                "densenet (the published checkpoints; the importer has "
                f"no {args.encoder_type} mapping)")

    if args.dataset == "kitti":
        encoder = ResnetEncoder(num_layers=args.num_layers)
        decoder = KittiWaveletDecoder(
            num_ch_enc=num_ch_enc(args.num_layers))
        model_name = f"resnet{args.num_layers} + KITTI wavelet decoder"
    else:
        from ..models.decoders_nyu import NyuDecoderWave
        if args.encoder_type == "densenet":
            from ..models.densenet import NUM_CH_ENC, DenseNet161Encoder
            encoder = DenseNet161Encoder(normalize_input=False)
            ch = NUM_CH_ENC
        else:
            from ..models.mobilenetv2 import MobileNetV2Encoder
            from ..models.mobilenetv2 import num_ch_enc as mobile_ch
            encoder = MobileNetV2Encoder(use_last_layer=False)
            ch = mobile_ch(False)
        decoder = NyuDecoderWave(num_ch_enc=tuple(ch), decoder_width=0.5)
        model_name = f"{args.encoder_type} + NYU DecoderWave"
        if args.densities:
            print("note: the edge-mask family needs mask_override "
                  "(KITTI decoder only) — skipping --densities for nyu")
            args.densities = []
    rng = jax.random.PRNGKey(0)

    # ---- inputs: synthetic scenes with GT disparity (or a real image)
    gt_disp = mg.synthetic_depth_scene(args.batch, args.height, args.width,
                                       seed=0)
    if args.image:
        from PIL import Image
        img = Image.open(args.image).convert("RGB").resize(
            (args.width, args.height), Image.LANCZOS)
        one = np.asarray(img, np.float32) / 255.0
        x = jnp.asarray(np.broadcast_to(one, (args.batch,) + one.shape))
        gt = None
    else:
        x = jnp.asarray(mg.scene_image(gt_disp, seed=0))
        gt = np.asarray(gt_disp)

    x1 = x[:1]
    enc_vars = encoder.init(rng, x1)
    dec_vars = decoder.init(rng, encoder.apply(enc_vars, x1))

    # the NYU decoder predicts at HALF input resolution (like the
    # reference, whose eval upsamples 2x) — fit GT to the output shape
    # (block mean; exact integer factors only)
    out_hw = jax.eval_shape(
        lambda e, d, i: decoder.apply(d, encoder.apply(e, i))[("disp", 0)],
        enc_vars, dec_vars, x).shape[1:3]

    def fit_to_output(arr):
        n, hh, ww, c = arr.shape
        h, w = out_hw
        if (hh, ww) == (h, w):
            return arr
        return arr.reshape(n, h, hh // h, w, ww // w, c).mean((2, 4))

    if gt is not None:
        gt = fit_to_output(gt)

    # ---- weight sources
    def synthetic_train(ev, dv, steps):
        """Supervised L1-on-disparity training on fresh synthetic scenes:
        the decoder's fixed point puts its yh on the scene's depth edges
        (maskgen docstring), which is what structures the masks."""
        import optax
        tx = optax.adam(1e-4)
        params = {"enc": ev, "dec": dv}
        opt_state = tx.init(params)
        # train on DIFFERENT scenes than the scoring batch (seed 0), so
        # abs_rel_vs_gt measures generalization, not training-set fit
        train_disp = mg.synthetic_depth_scene(
            args.batch, args.height, args.width, seed=100)
        xs = jnp.asarray(mg.scene_image(train_disp, seed=100))
        ys = jnp.asarray(fit_to_output(train_disp))

        def loss_fn(ps, img, disp):
            out = decoder.apply(ps["dec"], encoder.apply(ps["enc"], img))
            return jnp.abs(out[("disp", 0)] - disp).mean()

        @jax.jit
        def step(ps, os_, img, disp):
            loss, grads = jax.value_and_grad(loss_fn)(ps, img, disp)
            updates, os_ = tx.update(grads, os_, ps)
            return optax.apply_updates(ps, updates), os_, loss

        loss = None
        for i in range(steps):
            params, opt_state, loss = step(params, opt_state, xs, ys)
        if loss is not None:
            print(f"synthetic training: {steps} steps, "
                  f"final L1 {float(loss):.4f}")
        return params["enc"], params["dec"]

    sources = {}
    for src in dict.fromkeys(args.weights):
        if src == "random":
            sources[src] = (enc_vars, dec_vars)
        elif src == "synthetic":
            sources[src] = synthetic_train(enc_vars, dec_vars,
                                           args.train_steps)
        else:
            from . import torch_import as ti
            if args.dataset == "kitti":
                ev = ti.import_resnet_encoder(
                    ti.load_pth(os.path.join(args.torch_model_path,
                                             "encoder.pth")),
                    args.num_layers)
                dv = ti.import_kitti_wavelet_decoder(
                    ti.load_pth(os.path.join(args.torch_model_path,
                                             "depth.pth")))
            else:
                sd = ti.load_pth(args.torch_model_path)
                ev = ti.import_densenet_encoder(sd)
                dv = ti.import_nyu_wave_decoder(sd)
            sources[src] = (ev, dv)

    dtype = jnp.bfloat16 if args.bfloat16 else jnp.float32
    xd = x.astype(dtype)

    # ---- measurement: thresh_ratio is pure jnp math in the masked-dense
    # path (ops/sparse.wavelet_threshold_mask), so it rides as a TRACED
    # scalar — every threshold shares ONE compiled program per mode, and
    # the edge masks ride as array args likewise. On the remote TPU
    # (1-5 min per Mosaic/XLA compile, PERF.md) this turns ~4 compiles
    # per swept point into 6 programs for the whole sweep.
    @functools.partial(jax.jit, static_argnames=("k", "mode"))
    def chained(ev, dv, img, mo, thresh, k, mode):
        def body(i, carry):
            img_i = img + (carry * 1e-9).astype(img.dtype)
            feats = encoder.apply(ev, img_i)
            if mode == "dense":
                d = decoder.apply(dv, feats)[("disp", 0)]
            elif mode == "edge":
                d = decoder.apply(dv, feats, thresh_ratio=thresh,
                                  mask_override=mo)[("disp", 0)]
            else:                                   # "threshold"
                d = decoder.apply(dv, feats,
                                  thresh_ratio=thresh)[("disp", 0)]
            return carry + d.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    @functools.partial(jax.jit, static_argnames=("mode",))
    def forward(ev, dv, img, mo, thresh, mode):
        feats = encoder.apply(ev, img)
        if mode == "dense":
            return decoder.apply(dv, feats)
        if mode == "edge":
            return decoder.apply(dv, feats, thresh_ratio=thresh,
                                 mask_override=mo)
        return decoder.apply(dv, feats, thresh_ratio=thresh)

    k0, k1 = args.k
    dummy_masks = None
    rows = []

    def lat(spf):
        r = {"ms_per_image": spf * 1e3 / args.batch}
        if not spf > 0:           # tenancy swamped the window
            r["latency_unreliable"] = True
        return r

    def score(disp, dense_disp):
        r = {"disp_mae_vs_dense": float(np.abs(disp - dense_disp).mean())}
        denom = np.maximum(np.abs(dense_disp), 1e-3)
        r["abs_rel_vs_dense"] = float(
            (np.abs(disp - dense_disp) / denom).mean())
        if gt is not None:
            # mask to valid GT (sky disparity ~0 would dominate), the
            # same discipline as the KITTI evaluator's min-depth mask
            valid = gt > 0.05
            r["abs_rel_vs_gt"] = float(
                (np.abs(disp - gt)[valid] / gt[valid]).mean())
        return r

    for src, (ev, dv) in sources.items():
        evd = jax.tree_util.tree_map(lambda a: a.astype(dtype), ev)
        dvd = jax.tree_util.tree_map(lambda a: a.astype(dtype), dv)
        if dummy_masks is None:
            # mask pytree shape for the non-override calls (unused there,
            # but the jit signature wants a concrete pytree)
            m0, _, _ = mg.masks_at_density(gt_disp, 0.5)
            dummy_masks = {i: jnp.asarray(m) for i, m in m0.items()}

        zero = jnp.float32(0.0)
        dense_out = forward(evd, dvd, xd, dummy_masks, zero, "dense")
        dense_disp = np.asarray(dense_out[("disp", 0)], np.float32)
        dense_spf = _slope(
            lambda k: chained(evd, dvd, xd, dummy_masks, zero, k,
                              "dense"), k0, k1)
        # the dense decode carries no op counters; thresh=-1 is bit-equal
        # dense WITH counters (the golden-test identity)
        counted = forward(evd, dvd, xd, dummy_masks, jnp.float32(-1.0),
                          "threshold")
        base = {"weights": src, "mask_family": "dense", "threshold": None,
                "density": 1.0,
                "gflops": float(np.mean(counted[("total_ops", -1)]))
                / 1e9, **lat(dense_spf)}
        base.update(score(dense_disp, dense_disp))
        rows.append(base)
        print(f"[{src}] dense: {base['ms_per_image']:.3f} ms/img "
              f"{base['gflops']:.2f} GF"
              + (f" abs_rel_gt={base.get('abs_rel_vs_gt', 0):.4f}"
                 if gt is not None else ""))

        # threshold sweep (the decoder's own masks)
        for th in args.thresholds:
            tj = jnp.float32(th)
            out = forward(evd, dvd, xd, dummy_masks, tj, "threshold")
            spf = _slope(
                lambda k, _t=tj: chained(evd, dvd, xd, dummy_masks,
                                         _t, k, "threshold"), k0, k1)
            row = {"weights": src, "mask_family": "threshold",
                   "threshold": th,
                   "density": float(compute_density(out)),
                   "gflops": float(np.mean(out[("total_ops", -1)])) / 1e9,
                   **lat(spf)}
            row.update(score(np.asarray(out[("disp", 0)], np.float32),
                             dense_disp))
            rows.append(row)
            print(f"[{src}] thresh={th:6.3f}: density={row['density']:.4f} "
                  f"{row['ms_per_image']:.3f} ms/img "
                  f"{row['gflops']:.2f} GF "
                  f"mae={row['disp_mae_vs_dense']:.5f}")

        # edge-mask sweep (trained-model mask geometry at exact densities)
        for dens in args.densities:
            masks_np, ratio, actual = mg.masks_at_density(gt_disp, dens)
            mo = {i: jnp.asarray(m) for i, m in masks_np.items()}
            rj = jnp.float32(ratio)
            out = forward(evd, dvd, xd, mo, rj, "edge")
            spf = _slope(
                lambda k, _m=mo, _r=rj: chained(evd, dvd, xd, _m, _r, k,
                                                "edge"), k0, k1)
            row = {"weights": src, "mask_family": "edge",
                   "threshold": ratio, "target_density": dens,
                   "density": float(actual),
                   "gflops": float(np.mean(out[("total_ops", -1)])) / 1e9,
                   **lat(spf)}
            row.update(score(np.asarray(out[("disp", 0)], np.float32),
                             dense_disp))
            rows.append(row)
            print(f"[{src}] edge@{dens:.2f}: density={row['density']:.4f} "
                  f"{row['ms_per_image']:.3f} ms/img "
                  f"mae={row['disp_mae_vs_dense']:.5f}")

    result = {
        "meta": {
            "model": model_name,
            "shape": [args.batch, args.height, args.width],
            "dtype": "bfloat16" if args.bfloat16 else "float32",
            "device": str(jax.devices()[0]),
            "measurement": "slope (serialized on-device loop, "
                           f"K={k0}->{k1})",
            "inputs": (args.image or
                       "maskgen synthetic scenes (GT disparity axis)"),
            "train_steps": (args.train_steps
                            if "synthetic" in sources else 0),
        },
        "rows": rows,
    }
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}")
    return result


if __name__ == "__main__":
    main()

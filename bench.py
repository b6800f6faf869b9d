"""Benchmark: KITTI ResNet18 640x192 batch-16 inference on one chip —
dense wavelet decode vs sparse decode at the paper's ~10% coefficient
density operating point.

Prints ONE JSON line:
  {"metric": "kitti_r18_640x192_sparse_fps", "value": <frames/sec>,
   "unit": "frames/sec", "vs_baseline": <sparse_fps / dense_fps>}

Operating point: a trained model's wavelet masks are thin depth-edge
curves (the method's premise). No trained checkpoint is derivable in
this environment (zero egress), so masks are the thresholded TRUE Haar
DWT coefficients of synthetic piecewise-smooth road scenes — the masks
of an ideally-trained model — bisected to 10% aggregate density exactly
as evaluate_depth.py:37-47 aggregates it (utils/maskgen.py). Random-
init threshold masks are spatially white / near-dense at coarse scales
and are NOT the operating point (PERF.md round-2 mask statistics);
thresh-0.2 continuity numbers for round-1 comparison are in "extra".

Measurement: on this machine's remote-attached TPU, block_until_ready
does not await execution and single fetches pay a relay sync, so device
time uses the slope method: one jit of K serialized evaluations
(fori_loop, carry-dependent), fetched once; per-eval time =
(t(K1)-t(K0))/(K1-K0). Validated against jax.profiler device traces to
~2% (PERF.md "TRACED").
"""

from __future__ import annotations

import functools
import json
import os
import sys
import threading
import time

BATCH = 16
H, W = 192, 640
DENSITY = 0.10
TH_CONT = 0.2            # round-1 continuity operating point
K0, K1 = 1, 9

# The TPU here is remote (relay-attached "axon" platform) and the relay
# has gone down mid-session before; when it is down, jax.devices()
# blocks FOREVER (not an exception), which would hang whoever runs this
# script. Guard rails: a hard wall-clock watchdog on the whole run, and
# a threaded probe on first device contact.
WATCHDOG_S = 45 * 60          # full bench is ~10 min of remote compiles
DEVICE_PROBE_S = 5 * 60       # first contact incl. backend init


_CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".bench_last_good.json")


def _emit_error(reason: str) -> None:
    extra = {"error": reason,
             "note": "TPU relay unreachable or bench overran its "
                     "watchdog; no measurement was taken"}
    try:  # cite the newest successful window for context
        with open(_CACHE_PATH) as f:
            extra["last_good"] = json.load(f)
    except (OSError, ValueError):
        pass
    print(json.dumps({
        "metric": "kitti_r18_640x192_sparse_fps",
        "value": 0.0,
        "unit": "frames/sec",
        "vs_baseline": 0.0,
        "extra": extra,
    }), flush=True)


def _arm_watchdog() -> None:
    def fire():
        time.sleep(WATCHDOG_S)
        _emit_error(f"watchdog: bench exceeded {WATCHDOG_S}s")
        os._exit(2)
    threading.Thread(target=fire, daemon=True).start()


def _probe_devices() -> bool:
    """True iff jax can enumerate a device within DEVICE_PROBE_S."""
    ok = threading.Event()

    def probe():
        import jax
        if jax.devices():
            ok.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(DEVICE_PROBE_S)
    return ok.is_set()


def main():
    _arm_watchdog()
    if not _probe_devices():
        _emit_error(f"no device within {DEVICE_PROBE_S}s "
                    "(TPU relay down?)")
        return 2

    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: repeat windows skip the ~10 min
        # of remote compiles (keyed by HLO+platform; harmless if the
        # axon plugin declines executable serialization)
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser(
            os.environ.get("WMD_JAX_CACHE", "~/.cache/wmd_jax_cache")))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from wavelet_monodepth_tpu.models.decoders_kitti import \
        KittiWaveletDecoder
    from wavelet_monodepth_tpu.models.resnet import ResnetEncoder, \
        num_ch_enc
    from wavelet_monodepth_tpu.ops.sparse import compute_density
    from wavelet_monodepth_tpu.utils import maskgen as mg

    rng = jax.random.PRNGKey(0)
    encoder = ResnetEncoder(num_layers=18)
    decoder = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))

    disp = mg.synthetic_depth_scene(BATCH, H, W, seed=0)
    masks_np, ratio, _agg = mg.masks_at_density(disp, DENSITY)
    x = jnp.asarray(mg.scene_image(disp, seed=0))
    masks = {i: jnp.asarray(m) for i, m in masks_np.items()}

    x1 = x[:1]
    enc_vars = encoder.init(rng, x1)
    dec_vars = decoder.init(rng, encoder.apply(enc_vars, x1))

    @functools.partial(jax.jit,
                       static_argnames=("k", "mode", "backend"))
    def chained(ev, dv, img, mo, k, mode, backend=False):
        def body(i, carry):
            img_i = img + (carry * 1e-9).astype(img.dtype)
            feats = encoder.apply(ev, img_i)
            if mode == "dense":
                d = decoder.apply(dv, feats)[("disp", 0)]
            elif mode == "edge":
                d = decoder.apply(dv, feats, thresh_ratio=ratio,
                                  mask_override=mo,
                                  use_pallas=backend)[("disp", 0)]
            else:                                   # threshold
                d = decoder.apply(dv, feats, thresh_ratio=TH_CONT,
                                  use_pallas=backend)[("disp", 0)]
            return carry + d.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    # the shared slope-timing discipline (warmup both K's, min-of-reps,
    # tenancy retry on non-positive slopes) — one implementation for
    # bench.py / bench_grid / sparsity_sweep so it cannot drift
    from wavelet_monodepth_tpu.utils.timing import slope_time as slope

    def spf(ev, dv, img, mo, mode, backend=False, reps=2):
        """slope-measured seconds per frame"""
        return slope(lambda k: chained(ev, dv, img, mo, k, mode, backend),
                     K0, K1, reps) / BATCH

    results = {}

    def measure(name, *a, **kw):
        try:
            results[name] = spf(*a, **kw)
        except Exception as e:
            print(f"{name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            results[name] = float("inf")
        return results[name]

    measure("dense_f32", enc_vars, dec_vars, x, masks, "dense")
    measure("sparse_f32", enc_vars, dec_vars, x, masks, "edge")

    evb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                 enc_vars)
    dvb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                 dec_vars)
    xb = x.astype(jnp.bfloat16)
    measure("dense_bf16", evb, dvb, xb, masks, "dense")
    measure("sparse_bf16", evb, dvb, xb, masks, "edge")

    # round-1 continuity: random-init thresholded masks at 0.2
    measure("sparse_thresh02_f32", enc_vars, dec_vars, x, masks,
            "threshold")

    # batch-1 serving latency (slope-measured: the ~0.13 ms relay
    # dispatch floor makes naive batch-1 timing unusable, PERF.md) —
    # the reference's own serving shape (`test_simple.py`, batch-1
    # asserts at `depth_decoder.py:297`)
    b1 = {}
    try:
        xb1 = xb[:1]
        m1 = {i: m[:1] for i, m in masks.items()}
        K0b, K1b = 2, 34

        def spf1(mode):
            return slope(lambda k: chained(evb, dvb, xb1, m1, k, mode),
                         K0b, K1b)

        b1["batch1_ms_dense_bf16"] = round(1e3 * spf1("dense"), 4)
        b1["batch1_ms_sparse_bf16"] = round(1e3 * spf1("edge"), 4)
    except Exception as e:
        print(f"batch1 failed: {type(e).__name__}: {e}", file=sys.stderr)

    # MFU: XLA cost-analysis FLOPs over the slope-measured device time
    mfu = {}
    try:
        @jax.jit
        def one_dense(ev, dv, img):
            return decoder.apply(dv, encoder.apply(ev, img))[("disp", 0)]
        ca = one_dense.lower(evb, dvb, xb).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops_eval = float(ca.get("flops", 0.0))
        spf_dense = results.get("dense_bf16", float("inf"))
        if spf_dense not in (0.0, float("inf")):
            mfu["tflops_effective_dense_bf16"] = round(
                flops_eval / (spf_dense * BATCH) / 1e12, 2)
            mfu["gflop_per_frame"] = round(flops_eval / BATCH / 1e9, 2)
    except Exception as e:
        print(f"mfu failed: {type(e).__name__}: {e}", file=sys.stderr)

    @jax.jit
    def density_of(ev, dv, img, mo):
        out = decoder.apply(dv, encoder.apply(ev, img),
                            thresh_ratio=ratio, mask_override=mo)
        return compute_density(out)

    dens = float(density_of(enc_vars, dec_vars, x, masks))

    fps = {k: (0.0 if v == float("inf") else 1.0 / v)
           for k, v in results.items()}
    result = {
        "metric": "kitti_r18_640x192_sparse_fps",
        "value": round(fps["sparse_bf16"], 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps["sparse_bf16"]
                             / max(fps["dense_bf16"], 1e-9), 3),
        "extra": {
            "dtype": "bf16 (TPU-native inference config; --bfloat16 on "
                     "the eval/infer CLIs, accuracy delta tested)",
            "dense_bf16_fps": round(fps["dense_bf16"], 2),
            "dense_f32_fps": round(fps["dense_f32"], 2),
            "sparse_f32_fps": round(fps["sparse_f32"], 2),
            "sparse_f32_vs_dense_f32": round(
                fps["sparse_f32"] / max(fps["dense_f32"], 1e-9), 3),
            "sparse_thresh02_f32_fps": round(
                fps["sparse_thresh02_f32"], 2),
            "density": round(dens, 4),
            "mask_source": "true-DWT edge masks of synthetic scenes "
                           "(trained-model operating point)",
            "sparse_backend": "masked-dense oracle (fused heads); no "
                              "skipping engine beats dense on v5e at "
                              "this size - see PERF.md round-2b",
            "batch": BATCH,
            "measurement": "slope (serialized on-device loop)",
            "device": str(jax.devices()[0]),
            **b1,
            **mfu,
        },
    }
    try:  # cache the good run so a later relay-down error can cite it
        with open(_CACHE_PATH, "w") as f:
            json.dump({"cached_at": time.strftime("%Y-%m-%d %H:%M:%S"),
                       **result}, f)
    except OSError:
        pass
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

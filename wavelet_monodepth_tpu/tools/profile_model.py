"""Profiling / FLOP accounting — the TPU upgrade of the reference's
tracing story (SURVEY §5.1): the reference has wall-clock stage timers
and analytic op counters woven through the sparse decoders
(`depth_decoder.py:246-266,299-427`) plus thop/ptflops in notebooks.

This tool reports, for a chosen config:
  * XLA's own cost analysis (flops / bytes accessed) of the jitted
    forward — the compiler's ground truth;
  * the decoder's analytic `total_ops` at a threshold sweep — the
    paper's x-axis;
  * optionally a jax.profiler trace directory for xprof.

Usage:
  python -m wavelet_monodepth_tpu.tools.profile_model \
      [--height 192 --width 640 --num_layers 18] [--trace_dir /tmp/tr]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..models.decoders_kitti import KittiWaveletDecoder
    from ..models.resnet import ResnetEncoder, num_ch_enc
    from ..ops.sparse import compute_density

    p = argparse.ArgumentParser(description="profile_model")
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--num_layers", type=int, default=18)
    p.add_argument("--thresholds", nargs="+", type=float,
                   default=[-1, 0.05, 0.1])
    p.add_argument("--trace_dir", type=str, default=None)
    args = p.parse_args(argv)

    rng = jax.random.PRNGKey(0)
    encoder = ResnetEncoder(num_layers=args.num_layers)
    decoder = KittiWaveletDecoder(num_ch_enc=num_ch_enc(args.num_layers))
    x = jax.random.uniform(rng, (1, args.height, args.width, 3))
    enc_vars = encoder.init(rng, x)
    feats = encoder.apply(enc_vars, x)
    dec_vars = decoder.init(rng, feats)

    def dense(img):
        return decoder.apply(dec_vars,
                             encoder.apply(enc_vars, img))[("disp", 0)]

    lowered = jax.jit(dense).lower(x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    report = {
        "xla_cost_analysis": {
            "flops": cost.get("flops"),
            "bytes_accessed": cost.get("bytes accessed",
                                       cost.get("bytes_accessed")),
            "transcendentals": cost.get("transcendentals"),
        },
        "analytic_sweep": [],
    }

    for th in args.thresholds:
        out = decoder.apply(dec_vars, encoder.apply(enc_vars, x),
                            thresh_ratio=float(th))
        report["analytic_sweep"].append({
            "threshold": th,
            "decoder_gflops": float(np.mean(out[("total_ops", -1)])) / 1e9,
            "density": float(compute_density(out)),
        })

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            jax.block_until_ready(jax.jit(dense)(x))
        report["trace_dir"] = args.trace_dir

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

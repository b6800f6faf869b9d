"""On-device profiler: jax.profiler trace -> per-module device-time table.

SURVEY §5.1's TPU upgrade: the reference only has wall-clock stage timing
and analytic FLOP counters; this tool captures a real device trace of the
dense (and optionally sparse) forward, joins the trace events to HLO
instruction metadata (op_name carries the flax module path), and prints
per-module device milliseconds — the ground truth that bench.py's slope
method is validated against (they agree to <2%; PERF.md "traced").

Usage:
  python -m wavelet_monodepth_tpu.tools.profile_device \
      [--height 192 --width 640 --batch 16 --num_layers 18] \
      [--threshold 0.2] [--trace_dir /tmp/wmd_trace]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def collect_trace(fwd_jitted, args_tuple, trace_dir: str, iters: int = 8):
    """Run `iters` executions under jax.profiler.trace; return the path of
    the newest trace.json.gz."""
    r = fwd_jitted(*args_tuple)          # compile outside the trace
    import jax
    jax.block_until_ready(r)
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            r = fwd_jitted(*args_tuple)
        jax.block_until_ready(r)
    traces = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not traces:
        raise RuntimeError(f"no trace produced under {trace_dir}")
    return traces[-1]


def hlo_op_names(compiled_text: str) -> dict:
    """HLO instruction name -> op_name metadata (flax module path)."""
    meta = {}
    for m in re.finditer(r"%([\w.\-]+) = \S+ [^\n]*?op_name=\"([^\"]+)\"",
                         compiled_text):
        meta[m.group(1)] = m.group(2)
    return meta


def device_events(trace_path: str):
    """Yield (name, dur_us) for complete events on the TPU process."""
    with gzip.open(trace_path) as f:
        tr = json.load(f)
    tpu_pids = {e["pid"] for e in tr.get("traceEvents", [])
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            yield e["name"], e.get("dur", 0)


def attribute(trace_path: str, hlo_text: str, iters: int = 8,
              depth: int = 2):
    """Returns (total_ms_per_eval, [(group, ms_per_eval), ...])."""
    meta = hlo_op_names(hlo_text)
    dur = collections.Counter()
    total = 0.0
    for name, d in device_events(trace_path):
        if name.startswith("jit_"):
            total += d
            continue
        if name.isdigit():
            # per-iteration module rows (each is the whole program) —
            # counting them would double the per-op attribution
            continue
        op = meta.get(name)
        if op is None:
            op = "UNATTRIBUTED:" + name.split(".")[0]
        op = re.sub(r"^jit\([\w.\-]+\)/", "", op)
        dur["/".join(op.split("/")[:depth + 1])] += d
    groups = [(g, d / iters / 1e3) for g, d in dur.most_common()]
    return total / iters / 1e3, groups


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..models.decoders_kitti import KittiWaveletDecoder
    from ..models.resnet import ResnetEncoder, num_ch_enc

    p = argparse.ArgumentParser(description="device profiler")
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--num_layers", type=int, default=18)
    p.add_argument("--threshold", type=float, default=None,
                   help="profile the sparse path at this threshold")
    p.add_argument("--trace_dir", type=str, default="/tmp/wmd_trace")
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args(argv)

    rng = jax.random.PRNGKey(0)
    encoder = ResnetEncoder(num_layers=args.num_layers)
    decoder = KittiWaveletDecoder(num_ch_enc=num_ch_enc(args.num_layers))
    x1 = jax.random.uniform(rng, (1, args.height, args.width, 3),
                            jnp.float32)
    enc_vars = encoder.init(rng, x1)
    dec_vars = decoder.init(rng, encoder.apply(enc_vars, x1))
    x = jax.random.uniform(rng, (args.batch, args.height, args.width, 3),
                           jnp.float32)

    if args.threshold is None:
        def fwd(ev, dv, img):
            return decoder.apply(dv, encoder.apply(ev, img))[("disp", 0)]
    else:
        def fwd(ev, dv, img):
            return decoder.apply(dv, encoder.apply(ev, img),
                                 thresh_ratio=args.threshold)[("disp", 0)]

    jitted = jax.jit(fwd)
    hlo = jitted.lower(enc_vars, dec_vars, x).compile().as_text()
    trace = collect_trace(jitted, (enc_vars, dec_vars, x),
                          args.trace_dir, args.iters)
    total, groups = attribute(trace, hlo, args.iters)
    print(f"total device time: {total:.3f} ms/eval "
          f"({total / args.batch * 1e3:.1f} us/frame), "
          f"trace: {trace}")
    for g, ms in groups:
        if ms < 0.005:
            continue
        print(f"{ms:8.3f} ms/eval  {g}")


if __name__ == "__main__":
    main()

"""Attribute device-trace fusion times to HLO ops for the dense forward."""
import collections
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

TRACE = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/wmd_trace/plugins/profile/2026_08_16_16_19_26/vm.trace.json.gz"


def main():
    from wavelet_monodepth_tpu.models.decoders_kitti import \
        KittiWaveletDecoder
    from wavelet_monodepth_tpu.models.resnet import ResnetEncoder, num_ch_enc

    H, W, B = 192, 640, 16
    rng = jax.random.PRNGKey(0)
    encoder = ResnetEncoder(num_layers=18)
    decoder = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))
    x1 = jax.random.uniform(rng, (1, H, W, 3), jnp.float32)
    enc_vars = encoder.init(rng, x1)
    dec_vars = decoder.init(rng, encoder.apply(enc_vars, x1))
    x = jax.random.uniform(rng, (B, H, W, 3), jnp.float32)

    def fwd(ev, dv, img):
        return decoder.apply(dv, encoder.apply(ev, img))[("disp", 0)]

    hlo = jax.jit(fwd).lower(enc_vars, dec_vars, x).compile().as_text()

    # map hlo instruction name -> one-line summary (op kind + shape)
    defs = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (.*)", line)
        if m:
            defs[m.group(1)] = m.group(2)[:160]

    with gzip.open(TRACE) as f:
        tr = json.load(f)
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("pid") == 3:   # TPU process
            dur[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1

    total = dur.get("jit_fwd(14405040851517980087)", 0)
    for name in list(dur):
        if name.startswith("jit_fwd"):
            total = dur[name]
            del dur[name]
    print(f"total device: {total/8/1e3:.3f} ms/eval "
          f"({total/8/16:.1f} us/frame)")
    shown = 0
    for name, d in dur.most_common(40):
        per = d / cnt[name]
        summ = defs.get(name, "?")
        # for fusions, pull the fused computation's op mix
        kinds = ""
        if "fusion" in summ or name.startswith("fusion") or \
                "fusion" in name:
            m = re.search(r"calls=([\w.\-]+)", summ)
            if m:
                comp = m.group(1).lstrip("%")
                body = re.search(
                    rf"^%?{re.escape(comp)} \(.*?^}}", hlo,
                    re.M | re.S)
                if body:
                    ops = re.findall(r"= \w+\[.*?\] (\w+)\(",
                                     body.group(0))
                    top = collections.Counter(ops).most_common(5)
                    kinds = " | " + ",".join(f"{k}x{v}" for k, v in top)
        print(f"{d/8/1e3:8.3f} ms/eval x{cnt[name]:3d}  {name[:28]:28} "
              f"{summ[:90]}{kinds}")
        shown += d
        if shown > 0.92 * total * 8 / 8 and dur.most_common(40).index(
                (name, d)) > 24:
            break


if __name__ == "__main__":
    main()

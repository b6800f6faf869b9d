"""Minimal repro + fix validation for the chunked-warp NaN (round 5).

Symptom: the production KITTI train step (b12 640x192 bf16-mp) returned
loss=nan from its very first step on the real TPU, while the identical
batch was finite on CPU and finite on TPU at b2/b6 — caught by the
round-5 training soak (tools_dev/soak_kitti_experiment.py).

Bisection: b12 crosses grid_sample_border's anti-cliff chunk threshold
(per-image operand 5.9 MB -> 6 images/take), b2/b6 stay on the single
take. Forward-only chunked programs are exact; ONLY the fused
forward+backward program corrupts the forward VALUE of the last chunk's
tail (128 non-finite lanes at [11, 191, 512:, 2]) — i.e. an XLA/TPU
backend miscompile of jnp.concatenate(per-chunk takes) under jax.grad,
not a math bug (CPU runs the same trace bit-exactly).

Validated workarounds (this script, run on the real TPU 2026-08-19):
    [plain concat]   mean=nan  out_finite=False grads_finite=False
    [opt barrier]    mean=nan  (barrier does not block the bad fusion)
    [jax.checkpoint] mean=nan  (remat does not either)
    [stack+reshape]  mean=0.499601 out_finite=True grads_finite=True
                     == the single-take value exactly

Fix shipped in ops/image.py::_bilinear_gather: chunk size = largest
divisor of the (per-shard) batch within the operand budget, parts
combined with jnp.stack + reshape instead of concatenate.

Run: python tools_dev/warp_chunk_nan_experiment.py  (real TPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wavelet_monodepth_tpu.ops import image as I


def main():
    print("devices:", jax.devices(), flush=True)
    rs = np.random.RandomState(0)
    n, h, w, c = 12, 192, 640, 3
    img = jnp.asarray(rs.rand(n, h, w, c), jnp.float32)
    grid = jnp.asarray(rs.uniform(-1.2, 1.2, (n, h, w, 2)), jnp.float32)

    def f(img, grid):
        out = I.grid_sample_border(img, grid)
        return jnp.mean(out), out

    saved = I._TAKE_OPERAND_MAX_BYTES
    for tag, maxbytes in (("chunked(fixed)", saved), ("single", 1 << 60)):
        I._TAKE_OPERAND_MAX_BYTES = maxbytes
        (val, out), grads = jax.jit(jax.value_and_grad(
            f, argnums=(0, 1), has_aux=True))(img, grid)
        ofin = bool(np.isfinite(np.asarray(out)).all())
        gfin = all(bool(np.isfinite(np.asarray(g)).all()) for g in grads)
        print(f"[{tag}] mean={float(val):.6f} out_finite={ofin} "
              f"grads_finite={gfin}", flush=True)
    I._TAKE_OPERAND_MAX_BYTES = saved


if __name__ == "__main__":
    main()

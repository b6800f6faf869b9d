"""On-device (real TPU) verification of every sparse backend against
the masked-dense oracle at full capacity, KITTI R18 640x192 batch 2,
edge masks. CPU/interpret equality is covered by the test suite; this
confirms the Mosaic-compiled kernels and the XLA gathers agree on
hardware too."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from wavelet_monodepth_tpu.models.decoders_kitti import \
        KittiWaveletDecoder
    from wavelet_monodepth_tpu.models.resnet import ResnetEncoder, \
        num_ch_enc
    from wavelet_monodepth_tpu.utils import maskgen as mg

    B, H, W = 2, 192, 640
    rng = jax.random.PRNGKey(0)
    enc = ResnetEncoder(num_layers=18)
    dec = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))
    disp = mg.synthetic_depth_scene(B, H, W, seed=0)
    masks_np, ratio, _ = mg.masks_at_density(disp, 0.10)
    masks = {i: jnp.asarray(m) for i, m in masks_np.items()}
    x = jnp.asarray(mg.scene_image(disp, seed=0))
    ev = enc.init(rng, x[:1])
    dv = dec.init(rng, enc.apply(ev, x[:1]))
    feats = jax.jit(lambda e, i: enc.apply(e, i))(ev, x)

    def run(backend):
        @jax.jit
        def f(dv_, fe):
            return dec.apply(dv_, fe, thresh_ratio=ratio,
                             mask_override=masks, use_pallas=backend,
                             compact_cap=1.0)[("disp", 0)]
        return np.asarray(f(dv, feats))

    ref = run(False)
    out = {"density_ratio": ratio}
    # Interior margin per contract: "compact" recomputes halos from
    # masked inputs and differs only in a <=2px ring at each sparse
    # scale's OWN resolution (coarsest sparse scale 3 -> 2*2^3=16 px at
    # full res; 32 px is safely past dilation effects). Other backends
    # are exact everywhere (capacity: exact given compact_cap=1.0).
    for backend in (True, "pallas2d", "capacity", "compact", "sites"):
        try:
            got = run(backend)
            d = np.abs(got - ref)
            out[str(backend)] = {
                "max_full": round(float(d.max()), 7),
                "max_interior8": round(float(d[:, 8:-8, 8:-8].max()), 7),
                "max_interior32": round(
                    float(d[:, 32:-32, 32:-32].max()), 7)}
        except Exception as e:
            out[str(backend)] = f"ERR {type(e).__name__}: {str(e)[:120]}"
        print(backend, out[str(backend)], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

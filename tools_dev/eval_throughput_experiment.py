"""Wall-clock of the batched evaluators at full eval-set scale on one
v5e: KITTI eigen (697 images, dense + sparse w/ per-image thresholds)
and NYU labeled (654 images, DenseNet161). Round-1 VERDICT flagged
per-image eval as dispatch-dominated; the batched paths exist — this
measures them end-to-end (device + host glue, synthetic in-memory
images, excludes jpeg decode which is a host pipeline concern)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def kitti(res):
    import functools
    from wavelet_monodepth_tpu.eval import kitti_eval
    from wavelet_monodepth_tpu.models.decoders_kitti import \
        KittiWaveletDecoder
    from wavelet_monodepth_tpu.models.resnet import ResnetEncoder, \
        num_ch_enc

    N, H, W, BS = 697, 192, 640, 16
    rng = np.random.RandomState(0)
    imgs = rng.rand(N, H, W, 3).astype(np.float32)
    enc = ResnetEncoder(num_layers=18)
    dec = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))
    k = jax.random.PRNGKey(0)
    ev = enc.init(k, jnp.zeros((1, H, W, 3)))
    dv = dec.init(k, enc.apply(ev, jnp.zeros((1, H, W, 3))))

    @functools.partial(jax.jit, static_argnames="thresh")
    def forward(image, thresh=None):
        feats = enc.apply(ev, image)
        if thresh is None:
            return dec.apply(dv, feats)
        return dec.apply(dv, feats, thresh_ratio=thresh)

    def batches():
        for i in range(0, N, BS):
            yield imgs[i:i + BS]

    for mode, thresh in (("dense", None), ("sparse@0.1", 0.1)):
        # warm both batch shapes (697 = 43x16 + 9)
        for b in (imgs[:BS], imgs[-(N % BS):]):
            r = kitti_eval.predict_disps(
                forward, iter([b]), 0.1, 100.0, sparse_threshold=thresh)
        t0 = time.perf_counter()
        disps, info = kitti_eval.predict_disps(
            forward, batches(), 0.1, 100.0, sparse_threshold=thresh)
        dt = time.perf_counter() - t0
        assert disps.shape[0] == N
        res[f"kitti_eigen697_{mode}"] = {
            "seconds": round(dt, 2), "imgs_per_sec": round(N / dt, 1)}
        print(mode, res[f"kitti_eigen697_{mode}"], flush=True)


def nyu(res):
    import functools
    from wavelet_monodepth_tpu.eval import nyu_eval
    from wavelet_monodepth_tpu.models.factory import (make_nyu_decoder,
                                                      make_nyu_encoder)
    from wavelet_monodepth_tpu.utils.config import NyuOptions

    N = 654
    rng = np.random.RandomState(1)
    rgbs = rng.randint(0, 255, (N, 480, 640, 3), dtype=np.uint8)
    depths = (rng.rand(N, 480, 640) * 8 + 1).astype(np.float32)
    opts = NyuOptions(encoder_type="densenet", use_wavelets=True)
    enc, nch = make_nyu_encoder(opts)
    dec = make_nyu_decoder(nch, opts)
    k = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 480, 640, 3))
    ev = enc.init(k, x0)
    dv = dec.init(k, enc.apply(ev, x0))

    @functools.partial(jax.jit, static_argnames="thresh")
    def forward(image, thresh=None):
        feats = enc.apply(ev, image)
        if thresh is None:
            return dec.apply(dv, feats)
        return dec.apply(dv, feats, thresh_ratio=thresh)

    # warm both batch shapes (654 = 81x8 + 6)
    nyu_eval.evaluate(forward, rgbs[:8], depths[:8], batch_size=8)
    nyu_eval.evaluate(forward, rgbs[:6], depths[:6], batch_size=8)
    t0 = time.perf_counter()
    out = nyu_eval.evaluate(forward, rgbs, depths, batch_size=8)
    dt = time.perf_counter() - t0
    res["nyu_labeled654_dense"] = {
        "seconds": round(dt, 2), "imgs_per_sec": round(N / dt, 1)}
    print("nyu", res["nyu_labeled654_dense"],
          {k_: round(v, 4) for k_, v in out.items()}, flush=True)


def main():
    res = {}
    if '--nyu-only' in sys.argv:
        nyu(res)
    else:
        kitti(res)
        nyu(res)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

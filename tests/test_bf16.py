"""bf16 inference option: numeric tolerance vs f32 and CLI plumbing.

The reference is f32-only; bf16 is a TPU-native addition (PERF.md
measures ~1.2x on a v5e). Contract: `--bfloat16` runs params+activations
in bf16, outputs come back float32, and disparities stay within a small
absolute tolerance of the f32 forward (disp is sigmoid-bounded in [0,1]).
"""

import jax
import jax.numpy as jnp
import numpy as np

from wavelet_monodepth_tpu.models.decoders_kitti import KittiWaveletDecoder
from wavelet_monodepth_tpu.models.resnet import ResnetEncoder, num_ch_enc
from wavelet_monodepth_tpu.utils.precision import (cast_floats,
                                                   wrap_forward_bf16)

H, W = 96, 160


def _model():
    rng = jax.random.PRNGKey(0)
    encoder = ResnetEncoder(num_layers=18)
    decoder = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))
    x = jax.random.uniform(rng, (1, H, W, 3), jnp.float32)
    ev = encoder.init(rng, x)
    dv = decoder.init(rng, encoder.apply(ev, x))
    return encoder, decoder, ev, dv, x


def test_cast_floats_only_touches_floats():
    tree = {"a": jnp.ones((2, 2), jnp.float32),
            "b": jnp.ones((2,), jnp.int32), "c": 3}
    out = cast_floats(tree, jnp.bfloat16)
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.int32
    assert out["c"] == 3


def test_bf16_dense_forward_close_to_f32():
    encoder, decoder, ev, dv, x = _model()
    out32 = decoder.apply(dv, encoder.apply(ev, x))

    evb = cast_floats(ev, jnp.bfloat16)
    dvb = cast_floats(dv, jnp.bfloat16)

    def fwd(image):
        return decoder.apply(dvb, encoder.apply(evb, image))

    out16 = wrap_forward_bf16(fwd)(x)
    for s in range(4):
        d16 = np.asarray(out16[("disp", s)])
        d32 = np.asarray(out32[("disp", s)])
        assert d16.dtype == np.float32
        assert np.max(np.abs(d16 - d32)) < 0.05, s
        assert np.mean(np.abs(d16 - d32)) < 0.01, s


def test_bf16_sparse_forward_close_to_f32():
    encoder, decoder, ev, dv, x = _model()
    out32 = decoder.apply(dv, encoder.apply(ev, x), thresh_ratio=0.05)

    evb = cast_floats(ev, jnp.bfloat16)
    dvb = cast_floats(dv, jnp.bfloat16)

    def fwd(image, thresh):
        return decoder.apply(dvb, encoder.apply(evb, image),
                             thresh_ratio=thresh)

    out16 = wrap_forward_bf16(fwd)(x, 0.05)
    d16 = np.asarray(out16[("disp", 0)])
    assert d16.dtype == np.float32
    assert np.max(np.abs(d16 - np.asarray(out32[("disp", 0)]))) < 0.05


def test_evaluate_depth_cli_builds_bf16_forward():
    """The eval CLI's forward honors --bfloat16 end-to-end."""
    from wavelet_monodepth_tpu.tools.evaluate_depth import _load_forward
    from wavelet_monodepth_tpu.utils.config import KittiOptions

    opts = KittiOptions(height=H, width=W, use_wavelets=True,
                        bfloat16=True)
    fwd = _load_forward(opts, None)
    out = fwd(jnp.zeros((1, H, W, 3), jnp.float32))
    d = out[("disp", 0)]
    assert d.dtype == jnp.float32
    assert d.shape == (1, H, W, 1)

    opts32 = KittiOptions(height=H, width=W, use_wavelets=True)
    out32 = _load_forward(opts32, None)(jnp.zeros((1, H, W, 3),
                                                  jnp.float32))
    # same random init (PRNGKey(0) in _load_forward) -> near-equal disps
    assert np.max(np.abs(np.asarray(d) -
                         np.asarray(out32[("disp", 0)]))) < 0.05

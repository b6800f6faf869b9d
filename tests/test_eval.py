"""Evaluator tests on synthetic predictions/GT: scoring-loop semantics
(crop, scaling, clamping), flip post-processing, NYU edge metrics."""

import numpy as np
import pytest

from wavelet_monodepth_tpu.eval import kitti_eval, nyu_eval


def test_perfect_prediction_scores_zero_error():
    rng = np.random.RandomState(0)
    gt = rng.rand(3, 96, 320).astype(np.float64) * 60 + 2
    disps = 1.0 / gt
    # stereo eval multiplies by 5.4 -> pre-divide to compensate
    mean_errors, _ = kitti_eval.evaluate_disps(
        (disps * kitti_eval.STEREO_SCALE_FACTOR).astype(np.float32),
        list(gt), eval_split="eigen", eval_stereo=True)
    abs_rel, sq_rel, rmse = mean_errors[0], mean_errors[1], mean_errors[2]
    assert abs_rel < 1e-3 and rmse < 0.05
    assert mean_errors[4] > 0.999    # a1


def test_median_scaling_mono():
    rng = np.random.RandomState(1)
    gt = rng.rand(2, 96, 320).astype(np.float64) * 40 + 2
    disps = 2.5 / gt   # wrong global scale; median scaling must fix it
    mean_errors, ratios = kitti_eval.evaluate_disps(
        disps.astype(np.float32), list(gt), eval_split="eigen",
        eval_stereo=False)
    assert abs(ratios.mean() - 2.5) < 1e-2
    assert mean_errors[0] < 1e-3


def test_flip_postprocess_shape_and_identity():
    rng = np.random.RandomState(2)
    d = rng.rand(2, 8, 16).astype(np.float64)
    fused = kitti_eval.batch_post_process_disparity(d, d[:, :, ::-1][:, :, ::-1])
    assert fused.shape == d.shape
    np.testing.assert_allclose(fused, d, atol=1e-12)


def test_eigen_crop_mask():
    gt = np.ones((375, 1242)) * 10.0
    mask = kitti_eval.eigen_crop_mask(gt)
    assert mask[200, 600]           # inside crop
    assert not mask[10, 10]         # above crop
    assert not mask[200, 5]         # left of crop


def test_canny_finds_step_edge():
    img = np.zeros((64, 64))
    img[:, 32:] = 1.0
    edges = nyu_eval.canny(img)
    cols = np.where(edges.any(axis=0))[0]
    assert len(cols) > 0
    assert np.all(np.abs(cols - 31.5) < 3)


def test_depth_boundary_error_perfect_edges():
    # depths are strictly positive (the eval clamps to [0.4, 10], and the
    # normalizer NaNs exact zeros)
    img = np.full((64, 64), 1.0)
    img[:, 32:] = 2.0
    gt_edges = nyu_eval.canny(img / img.max())
    acc, com, _ = nyu_eval.compute_depth_boundary_error(gt_edges, img)
    assert acc < 1.0 and com < 1.0   # predicted edges land on GT edges


def test_depth_boundary_error_no_gt_edges():
    acc, com, _ = nyu_eval.compute_depth_boundary_error(
        np.zeros((32, 32)), np.random.rand(32, 32))
    assert np.isnan(acc) and np.isnan(com)


def test_nyu_metrics_perfect():
    gt = np.random.RandomState(3).rand(4, 32, 32) * 5 + 1
    res = nyu_eval.compute_errors_nyu(gt, gt.copy())
    assert res[0] < 1e-9 and res[1] < 1e-9
    assert res[3] == 1.0


def test_nyu_predict_depth_pipeline():
    """predict_depth geometry: uint8 480x640 in, clamped metric depth
    480x640 out, via a fake forward returning constant disp."""
    import jax.numpy as jnp

    def forward(x, thresh):
        assert x.shape == (1, 480, 640, 3)
        # constant 250cm prediction at half resolution
        return {("disp", 0): jnp.full((1, 240, 320, 1), 250.0)}

    rgb = np.random.RandomState(4).randint(0, 255, (480, 640, 3),
                                           dtype=np.uint8)
    pred = nyu_eval.predict_depth(forward, rgb)
    assert pred.shape == (480, 640)
    np.testing.assert_allclose(pred, 2.5, atol=1e-5)


def test_nyu_224_gt_alignment_border_crop():
    """use_224 GT must be border-cropped 16px BEFORE the 224 resize
    (`NYUv2/utils.py:289-291`) so it aligns with predictions made from
    border-cropped RGB. An oracle forward that returns exactly the
    cropped-then-resized depth must score ~zero error."""
    import jax.numpy as jnp
    from wavelet_monodepth_tpu.ops.image import resize_bilinear

    yy, xx = np.mgrid[0:480, 0:640].astype(np.float32)
    depth = 1.0 + 4.0 * xx / 640 + 2.0 * yy / 480      # in (0.4, 10)
    aligned = np.asarray(resize_bilinear(
        depth[None, 16:-16, 16:-16, None], 224, 224,
        align_corners=True))                            # (1,224,224,1)

    def forward(x, thresh):
        assert x.shape == (1, 224, 224, 3)
        return {("disp", 0): jnp.asarray(aligned) * 100.0}

    rgb = np.zeros((1, 480, 640, 3), np.uint8)
    res = nyu_eval.evaluate(forward, rgb, depth[None], use_224=True)
    assert res["abs_rel"] < 1e-5 and res["rmse"] < 1e-4


# --- exact-Canny fixtures (skimage semantics: interpolated NMS, 8-conn
# hysteresis, border erosion; see nyu_eval module docstring) ---------------

def test_canny_step_edge_is_thin_and_interior():
    img = np.zeros((40, 40))
    img[:, 20:] = 1.0
    edges = nyu_eval.canny(img)
    # a perfectly symmetric step ties the two center columns; skimage's
    # <=-NMS keeps the 2-px plateau, nothing else
    interior = edges[1:-1, :]
    assert (interior.sum(axis=1) == 2).all()
    cols = np.where(edges.any(axis=0))[0]
    assert list(cols) == [19, 20]
    # eroded mask: never any edge on the image border
    assert not edges[0, :].any() and not edges[-1, :].any()
    assert not edges[:, 0].any() and not edges[:, -1].any()


def test_canny_diagonal_edge_is_thin():
    ii, jj = np.mgrid[0:48, 0:48]
    img = (jj > ii).astype(float)
    edges = nyu_eval.canny(img)
    assert edges.any()
    # diagonal NMS: at most 2 hits per anti-gradient line, clustered on
    # the diagonal
    dist = np.abs(jj - ii)[edges]
    assert dist.max() <= 2


def test_canny_flat_image_no_edges():
    assert not nyu_eval.canny(np.full((32, 32), 0.7)).any()
    assert not nyu_eval.canny(np.zeros((32, 32))).any()


def test_canny_hysteresis_keeps_connected_weak_drops_isolated():
    # peak Sobel magnitude of a smoothed step is ~2.0x the step height, so
    # step>=0.15 is a strong (>=0.3) seed and step in [0.075, 0.149) is the
    # weak band. A contrast-decaying edge (strong top, weak bottom, one
    # 8-connected component) is kept in full; the weak-only version dies.
    amp_conn = np.linspace(0.4, 0.09, 48)[:, None]
    img_conn = np.zeros((48, 40))
    img_conn[:, 20:] = amp_conn
    e_conn = nyu_eval.canny(img_conn)
    assert e_conn[40:46, :].any()        # weak tail kept via connectivity

    amp_weak = np.linspace(0.14, 0.09, 48)[:, None]   # all weak, no seed
    img_weak = np.zeros((48, 40))
    img_weak[:, 20:] = amp_weak
    assert not nyu_eval.canny(img_weak).any()


def test_canny_low_threshold_gates_weak_edges():
    img = np.zeros((32, 32))
    img[:, 16:] = 0.03                   # peak magnitude ~0.06 < low=0.15
    assert not nyu_eval.canny(img).any()


# --- batched eval == sequential eval (per-image thresholds/op counts) -----

def _tiny_kitti_forward():
    import jax
    import jax.numpy as jnp
    from wavelet_monodepth_tpu.models.decoders_kitti import \
        KittiWaveletDecoder
    from wavelet_monodepth_tpu.models.resnet import ResnetEncoder, num_ch_enc
    rng = jax.random.PRNGKey(0)
    enc = ResnetEncoder(num_layers=18)
    dec = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    ev = enc.init(rng, x)
    dv = dec.init(rng, enc.apply(ev, x))

    def forward(image, thresh=None):
        feats = enc.apply(ev, image)
        if thresh is None:
            return dec.apply(dv, feats)
        return dec.apply(dv, feats, thresh_ratio=thresh)
    return forward


def test_batched_sparse_eval_equals_sequential():
    rng = np.random.RandomState(3)
    imgs = rng.rand(4, 64, 96, 3).astype(np.float32)
    forward = _tiny_kitti_forward()

    d_batch, info_b = kitti_eval.predict_disps(
        forward, [imgs], sparse_threshold=0.04)
    d_seq, info_s = kitti_eval.predict_disps(
        forward, [imgs[i] for i in range(4)], sparse_threshold=0.04)
    np.testing.assert_allclose(d_batch, d_seq, atol=2e-4)
    assert info_b["total_ops_mean"] == pytest.approx(
        info_s["total_ops_mean"], rel=1e-6)
    assert info_b["density_mean"] == pytest.approx(
        info_s["density_mean"], rel=1e-6)


def test_nyu_batched_predict_equals_per_image():
    rng = np.random.RandomState(4)
    rgbs = (rng.rand(3, 480, 640, 3) * 255).astype(np.uint8)
    forward = _tiny_nyu_like_forward()

    batch = nyu_eval.predict_depth_batch(forward, rgbs)
    for i in range(3):
        single = nyu_eval.predict_depth(forward, rgbs[i])
        np.testing.assert_allclose(batch[i], single, atol=1e-6)


def _tiny_nyu_like_forward():
    """A cheap stand-in model: a fixed conv producing ("disp", 0) — the
    batching contract being tested lives in the pre/post-processing."""
    import jax.numpy as jnp

    def forward(x, thresh=None):
        d = 50.0 + 400.0 * jnp.mean(x, axis=-1, keepdims=True)
        return {("disp", 0): d}
    return forward


def test_eval_forward_uint8_feed_matches_f32():
    """evaluate_depth's jitted forward: a uint8 batch equals the f32
    batch of the same pixels/255 — f32 exactly, bf16 wrapper to f32
    output tolerance."""
    import jax
    import jax.numpy as jnp
    from wavelet_monodepth_tpu.tools.evaluate_depth import _load_forward
    from wavelet_monodepth_tpu.utils.config import KittiOptions

    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 255, (2, 64, 96, 3), np.uint8)
    for bf16 in (False, True):
        opts = KittiOptions(height=64, width=96, use_wavelets=True,
                            bfloat16=bf16)
        forward = _load_forward(opts, None)
        out_u8 = forward(jnp.asarray(u8))
        out_f32 = forward(jnp.asarray(u8, jnp.float32) / 255.0)
        a = np.asarray(out_u8[("disp", 0)])
        b = np.asarray(out_f32[("disp", 0)])
        # not bit-equal even at f32: inside the jit XLA reassociates
        # the /255 into the folded stem normalization (1-ulp scale)
        np.testing.assert_allclose(a, b, atol=2e-3 if bf16 else 1e-5)


def test_sparse_eval_respects_post_process_flag():
    """Sparse + post_process=True flip-fuses (two forwards, ops counted
    over both — the reference's only runnable sparse protocol,
    `evaluate_depth.py:173-206`); post_process=False does ONE forward
    (the reference crashes on that combination — honest deviation,
    DEVIATIONS.md)."""
    rng = np.random.RandomState(5)
    imgs = rng.rand(2, 64, 96, 3).astype(np.float32)
    forward = _tiny_kitti_forward()

    d_plain, info_plain = kitti_eval.predict_disps(
        forward, [imgs], sparse_threshold=0.04, post_process=False)
    d_fused, info_fused = kitti_eval.predict_disps(
        forward, [imgs], sparse_threshold=0.04, post_process=True)

    # fused != plain, and fusing by hand reproduces the fused output
    assert not np.allclose(d_plain, d_fused, atol=1e-5)
    import jax.numpy as jnp
    from wavelet_monodepth_tpu.ops.geometry import disp_to_depth
    out_f = forward(jnp.flip(jnp.asarray(imgs), axis=2), 0.04)
    df, _ = disp_to_depth(out_f[("disp", 0)], 0.1, 100.0)
    expect = kitti_eval.batch_post_process_disparity(
        d_plain, np.asarray(df)[..., 0][:, :, ::-1])
    np.testing.assert_allclose(d_fused, expect, atol=1e-5)
    # fused ops average over BOTH passes (flipped masks differ):
    # mean = (plain_mean + flipped_mean) / 2
    flip_mean = float(np.mean(np.asarray(out_f[("total_ops", -1)])))
    assert info_fused["total_ops_mean"] == pytest.approx(
        (info_plain["total_ops_mean"] + flip_mean) / 2, rel=1e-6)


def test_evaluate_disps_requires_explicit_protocol():
    """eval_stereo must be chosen explicitly, like the reference's
    --eval_mono/--eval_stereo assert (`evaluate_depth.py:88-89`)."""
    gt = np.random.RandomState(0).rand(1, 96, 320) * 40 + 2
    with pytest.raises(ValueError, match="mono or stereo"):
        kitti_eval.evaluate_disps((1.0 / gt).astype(np.float32),
                                  list(gt))

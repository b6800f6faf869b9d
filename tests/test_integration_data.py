"""Release-gate integration tests — run only when real datasets are
present (SURVEY §4: golden-metric evaluation against the README tables is
the reference's de-facto test). See GOLDEN_GATES.md for the full
runbook. Point the env vars at local data to enable:

  WMD_KITTI_DATA            KITTI raw root (with splits/ + gt_depths.npz)
  WMD_KITTI_WEIGHTS         R18 640x192 reference weights folder
                            (encoder.pth/depth.pth)
  WMD_KITTI_WEIGHTS_R50     R50 640x192 weights folder
  WMD_KITTI_WEIGHTS_R18_1024 / WMD_KITTI_WEIGHTS_R50_1024
                            1024x320 weights folders
  WMD_KITTI_ODOM_DATA       KITTI odometry root (sequences/ + poses/)
  WMD_KITTI_POSE_WEIGHTS    pose weights folder (pose_encoder.pth/pose.pth)
  WMD_NYU_MAT               nyu_depth_v2_labeled.mat
  WMD_NYU_SPLITS            splits.mat
  WMD_NYU_WEIGHTS           reference DenseNet161 DecoderWave model.pth
  WMD_NYU_EDGES             NYUv2-OC++ edge png dir (optional: ε_acc gate)
"""

import os

import numpy as np
import pytest

KITTI_DATA = os.environ.get("WMD_KITTI_DATA")
KITTI_WEIGHTS = os.environ.get("WMD_KITTI_WEIGHTS")
KITTI_ODOM_DATA = os.environ.get("WMD_KITTI_ODOM_DATA")
KITTI_POSE_WEIGHTS = os.environ.get("WMD_KITTI_POSE_WEIGHTS")
NYU_MAT = os.environ.get("WMD_NYU_MAT")
NYU_SPLITS = os.environ.get("WMD_NYU_SPLITS")
NYU_WEIGHTS = os.environ.get("WMD_NYU_WEIGHTS")
NYU_EDGES = os.environ.get("WMD_NYU_EDGES")


def _eigen_metrics(weights, num_layers, height, width):
    """Dense eigen-split eval with reference weights: abs_rel, rmse, a1."""
    from wavelet_monodepth_tpu.tools import evaluate_depth
    from wavelet_monodepth_tpu.data import kitti as kitti_data
    from wavelet_monodepth_tpu.eval import kitti_eval
    from wavelet_monodepth_tpu.utils.config import KittiOptions

    files = kitti_data.readlines(os.path.join(
        KITTI_DATA, "splits", "eigen", "test_files.txt"))
    opts = KittiOptions(data_path=KITTI_DATA, use_wavelets=True,
                        eval_stereo=True, num_layers=num_layers,
                        height=height, width=width)
    forward = evaluate_depth._load_forward(opts, weights)
    ds = kitti_data.KittiRawDataset(KITTI_DATA, files, height, width,
                                    [0], is_train=False)

    def images():
        for i in range(len(ds)):
            yield ds[i][("color", "0", 0)]

    pred_disps, _ = kitti_eval.predict_disps(forward, images())
    gt = np.load(os.path.join(KITTI_DATA, "splits", "eigen",
                              "gt_depths.npz"),
                 fix_imports=True, encoding="latin1",
                 allow_pickle=True)["data"]
    mean_errors, _ = kitti_eval.evaluate_disps(pred_disps, gt,
                                               eval_stereo=True)
    return mean_errors[0], mean_errors[2], mean_errors[4]


# README.md:81-84 rows: (env var, layers, h, w, abs_rel, rmse, a1)
_KITTI_ROWS = [
    ("WMD_KITTI_WEIGHTS_R50", 50, 192, 640, 0.105, 4.625, 0.879),
    ("WMD_KITTI_WEIGHTS_R18_1024", 18, 320, 1024, 0.102, 4.452, 0.890),
    ("WMD_KITTI_WEIGHTS_R50_1024", 50, 320, 1024, 0.097, 4.387, 0.891),
]


@pytest.mark.parametrize("env,layers,h,w,abs_rel,rmse,a1", _KITTI_ROWS,
                         ids=[r[0] for r in _KITTI_ROWS])
def test_eigen_table_rows_match_published(env, layers, h, w, abs_rel,
                                          rmse, a1):
    """Golden gates for the remaining KITTI README rows
    (`README.md:82-84`): R50 640x192 and both 1024x320 configs."""
    weights = os.environ.get(env)
    if not (KITTI_DATA and weights):
        pytest.skip(f"KITTI data / {env} not available")
    got = _eigen_metrics(weights, layers, h, w)
    assert abs(got[0] - abs_rel) < 0.005
    assert abs(got[1] - rmse) < 0.15
    assert abs(got[2] - a1) < 0.01


@pytest.mark.skipif(not (KITTI_DATA and KITTI_WEIGHTS),
                    reason="KITTI data/weights not available")
def test_eigen_dense_eval_matches_published():
    """Golden gate: ResNet18 640x192 stereo+hints dense decode on the
    eigen split must land within noise of README.md:81
    (abs_rel 0.106, RMSE 4.693, a1 0.876)."""
    from wavelet_monodepth_tpu.tools import evaluate_depth
    from wavelet_monodepth_tpu.data import kitti as kitti_data
    from wavelet_monodepth_tpu.eval import kitti_eval

    os.environ["WMD_TORCH_MODEL_PATH"] = KITTI_WEIGHTS
    files = kitti_data.readlines(os.path.join(
        KITTI_DATA, "splits", "eigen", "test_files.txt"))
    from wavelet_monodepth_tpu.utils.config import KittiOptions
    opts = KittiOptions(data_path=KITTI_DATA, use_wavelets=True,
                        eval_stereo=True, height=192, width=640)
    forward = evaluate_depth._load_forward(opts, KITTI_WEIGHTS)
    ds = kitti_data.KittiRawDataset(KITTI_DATA, files, 192, 640, [0],
                                    is_train=False)

    def images():
        for i in range(len(ds)):
            yield ds[i][("color", "0", 0)]

    pred_disps, _ = kitti_eval.predict_disps(forward, images())
    gt = np.load(os.path.join(KITTI_DATA, "splits", "eigen",
                              "gt_depths.npz"),
                 fix_imports=True, encoding="latin1",
                 allow_pickle=True)["data"]
    mean_errors, _ = kitti_eval.evaluate_disps(pred_disps, gt,
                                               eval_stereo=True)
    abs_rel, rmse, a1 = mean_errors[0], mean_errors[2], mean_errors[4]
    assert abs(abs_rel - 0.106) < 0.005
    assert abs(rmse - 4.693) < 0.15
    assert abs(a1 - 0.876) < 0.01


@pytest.mark.skipif(not (KITTI_DATA and KITTI_WEIGHTS),
                    reason="KITTI data/weights not available")
def test_sparse_score_loss_within_claim():
    """Paper claim (README.md:97): <=1.4% relative score loss at ~10%
    density with sparse decoding."""
    from wavelet_monodepth_tpu.tools import evaluate_depth
    from wavelet_monodepth_tpu.data import kitti as kitti_data
    from wavelet_monodepth_tpu.eval import kitti_eval
    from wavelet_monodepth_tpu.utils.config import KittiOptions

    files = kitti_data.readlines(os.path.join(
        KITTI_DATA, "splits", "eigen", "test_files.txt"))[:100]
    opts = KittiOptions(data_path=KITTI_DATA, use_wavelets=True,
                        use_sparse=True, eval_stereo=True,
                        height=192, width=640)
    forward = evaluate_depth._load_forward(opts, KITTI_WEIGHTS)
    ds = kitti_data.KittiRawDataset(KITTI_DATA, files, 192, 640, [0],
                                    is_train=False)

    def images():
        for i in range(len(ds)):
            yield ds[i][("color", "0", 0)]

    dense_disps, _ = kitti_eval.predict_disps(forward, images())
    sparse_disps, info = kitti_eval.predict_disps(
        forward, images(), sparse_threshold=0.05)
    gt = np.load(os.path.join(KITTI_DATA, "splits", "eigen",
                              "gt_depths.npz"),
                 fix_imports=True, encoding="latin1",
                 allow_pickle=True)["data"][:100]
    dense_err, _ = kitti_eval.evaluate_disps(dense_disps, gt,
                                             eval_stereo=True)
    sparse_err, _ = kitti_eval.evaluate_disps(sparse_disps, gt,
                                              eval_stereo=True)
    rel_loss = (sparse_err[0] - dense_err[0]) / dense_err[0]
    assert rel_loss < 0.02
    assert info["density_mean"] < 0.2


@pytest.mark.skipif(not (NYU_MAT and NYU_SPLITS and NYU_WEIGHTS),
                    reason="NYU data/weights not available")
def test_nyu_densenet161_matches_published(capsys):
    """Golden gate: DenseNet161 DecoderWave on the 654-image labeled
    test set must land within noise of README.md:131 (abs_rel 0.1258,
    rmse 0.5515, δ1 0.8451; ε_acc 1.8070 when NYUv2-OC++ edges are
    mounted)."""
    from wavelet_monodepth_tpu.tools.evaluate_nyu import main as ev_main
    argv = ["--data_path", NYU_MAT, "--splits_path", NYU_SPLITS,
            "--torch_model_path", NYU_WEIGHTS,
            "--encoder_type", "densenet", "--use_wavelets"]
    if NYU_EDGES:
        argv += ["--edges_dir", NYU_EDGES]
    ev_main(argv)
    out = capsys.readouterr().out
    vals = [float(t) for t in out.split()[-8 if NYU_EDGES else -6:]]
    abs_rel, rmse, a1 = vals[0], vals[1], vals[3]
    assert abs(abs_rel - 0.1258) < 0.003
    assert abs(rmse - 0.5515) < 0.01
    assert abs(a1 - 0.8451) < 0.005
    if NYU_EDGES:
        assert abs(vals[6] - 1.8070) < 0.1


@pytest.mark.skipif(not (KITTI_ODOM_DATA and KITTI_POSE_WEIGHTS),
                    reason="KITTI odometry data / pose weights missing")
@pytest.mark.parametrize("split,max_ate", [("odom_9", 0.05),
                                           ("odom_10", 0.05)])
def test_odometry_ate_within_range(split, max_ate, capsys):
    """Golden gate: 5-frame-track ATE on odom 09/10 with reference pose
    weights. The reference publishes no odometry table; the bound is the
    monodepth2-lineage operating range (ATE ~0.017±0.01,
    `KITTI/evaluate_pose.py:23-134`), so this catches wiring/convention
    regressions rather than exact parity."""
    from wavelet_monodepth_tpu.tools.evaluate_pose import main as ev_main
    ev_main(["--data_path", KITTI_ODOM_DATA, "--eval_split", split,
             "--torch_model_path", KITTI_POSE_WEIGHTS])
    out = capsys.readouterr().out
    line = [ln for ln in out.splitlines() if "Trajectory error" in ln][0]
    ate = float(line.split(":")[1].split(",")[0])
    assert np.isfinite(ate) and 0 < ate < max_ate


def test_canny_matches_skimage_ab():
    """Offline A/B for DEVIATIONS #22: our exact-Canny reimplementation
    against scikit-image's (<=0.18 semantics) on structured + random
    images. Runs wherever skimage is installable (not this image —
    zero egress); the fixtures in test_eval.py carry CI coverage."""
    skimage = pytest.importorskip("skimage")
    from skimage.feature import canny as sk_canny
    from wavelet_monodepth_tpu.eval.nyu_eval import canny as our_canny

    rng = np.random.RandomState(11)
    yy, xx = np.mgrid[0:96, 0:128]
    images = [
        (xx > 64).astype(float),                          # step
        ((xx - 64) ** 2 + (yy - 48) ** 2 < 900).astype(float),  # disc
        np.sin(xx / 7.0) * np.cos(yy / 9.0),              # bands
        rng.rand(96, 128),                                # noise
    ]
    for i, img in enumerate(images):
        ours = our_canny(img)
        theirs = sk_canny(img, sigma=np.sqrt(2), low_threshold=0.15,
                          high_threshold=0.3)
        np.testing.assert_array_equal(ours, theirs,
                                      err_msg=f"image {i}")

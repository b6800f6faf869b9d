"""Release-gate integration tests — run only when real datasets are
present (SURVEY §4: golden-metric evaluation against the README tables is
the reference's de-facto test). Point the env vars at local data to
enable:

  WMD_KITTI_DATA   KITTI raw root (with splits/ and gt_depths.npz)
  WMD_KITTI_WEIGHTS  reference weights folder (encoder.pth/depth.pth)
  WMD_NYU_MAT      nyu_depth_v2_labeled.mat
  WMD_NYU_SPLITS   splits.mat
"""

import os

import numpy as np
import pytest

KITTI_DATA = os.environ.get("WMD_KITTI_DATA")
KITTI_WEIGHTS = os.environ.get("WMD_KITTI_WEIGHTS")
NYU_MAT = os.environ.get("WMD_NYU_MAT")


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

"""Odometry-eval CLI e2e on a fabricated mini-odom tree
(`KITTI/evaluate_pose.py:23-134` equivalent): sequences/NN pngs +
poses/NN.txt through tools/evaluate_pose.main, plus the GT-fed
trajectory identity (exact relative poses -> ATE ~ 0)."""

import os

import numpy as np
import pytest
from PIL import Image

N_FRAMES = 8


@pytest.fixture(scope="module")
def mini_odom(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_odom")
    rng = np.random.RandomState(2)
    img_dir = root / "sequences" / "09" / "image_2"
    img_dir.mkdir(parents=True)
    for f in range(N_FRAMES):
        arr = rng.randint(0, 255, (64, 192, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{f:06d}.png")

    poses_dir = root / "poses"
    poses_dir.mkdir()
    # forward motion with a slow yaw: a non-degenerate trajectory
    rows = []
    for i in range(N_FRAMES):
        th = 0.02 * i
        T = np.array([[np.cos(th), 0, np.sin(th), 0.1 * i],
                      [0, 1, 0, 0.01 * i],
                      [-np.sin(th), 0, np.cos(th), 0.5 * i]])
        rows.append(" ".join(f"{v:.9e}" for v in T.reshape(-1)))
    (poses_dir / "09.txt").write_text("\n".join(rows) + "\n")

    splits = root / "splits" / "odom"
    splits.mkdir(parents=True)
    (splits / "test_files_09.txt").write_text(
        "".join(f"9 {f} l\n" for f in range(N_FRAMES - 1)))
    return str(root)


def test_evaluate_pose_cli_end_to_end(mini_odom, capsys):
    """The one L5 CLI whose main never ran in CI (VERDICT r2 #7):
    fresh-init pose net over the fabricated tree -> finite ATE line."""
    from wavelet_monodepth_tpu.tools.evaluate_pose import main as ev_main
    ev_main(["--data_path", mini_odom, "--eval_split", "odom_9",
             "--height", "64", "--width", "128",
             "--splits_dir", os.path.join(mini_odom, "splits")])
    out = capsys.readouterr().out
    line = [ln for ln in out.splitlines() if "Trajectory error" in ln][0]
    ate = float(line.split(":")[1].split(",")[0])
    assert np.isfinite(ate) and ate >= 0


def test_gt_fed_trajectory_has_zero_ate(mini_odom):
    """Feeding the evaluator the exact local GT transforms must score
    ~zero ATE — pins the pose-chain conventions (inversion order,
    track windowing) against the fabricated trajectory."""
    from wavelet_monodepth_tpu.eval import pose_eval
    gt = np.loadtxt(os.path.join(mini_odom, "poses",
                                 "09.txt")).reshape(-1, 3, 4)
    pred = np.stack(pose_eval.local_gt_poses(gt))
    mean_ate, std_ate = pose_eval.evaluate_trajectory(pred, gt)
    assert mean_ate < 1e-6 and std_ate < 1e-6


def test_train_cli_on_odom_split(mini_odom, tmp_path_factory):
    """Mono + pose-net training through the real CLI on the odometry
    path scheme (--dataset kitti_odom): the two CLI combinations the
    stereo e2e never runs — temporal frame_ids with a pose decoder, and
    the sequences/NN/image_2 layout (`kitti_dataset.py` odom scheme)."""
    from wavelet_monodepth_tpu.tools.train_kitti import main as train_main
    splits = os.path.join(mini_odom, "splits", "odom")
    with open(os.path.join(splits, "train_files.txt"), "w") as f:
        f.write("".join(f"9 {i} l\n" for i in range(1, 7)))
    with open(os.path.join(splits, "val_files.txt"), "w") as f:
        f.write("9 2 l\n9 3 l\n")
    log_dir = str(tmp_path_factory.mktemp("odom_logs"))
    train_main(["--data_path", mini_odom, "--log_dir", log_dir,
                "--model_name", "odo", "--split", "odom",
                "--dataset", "kitti_odom", "--png",
                "--height", "64", "--width", "128",
                "--frame_ids", "0", "-1", "1",
                "--batch_size", "2", "--num_epochs", "1",
                "--use_wavelets", "--log_frequency", "1",
                "--save_frequency", "1"])
    folder = os.path.join(log_dir, "odo", "models", "weights_0")
    assert os.path.exists(os.path.join(folder, "state.msgpack"))

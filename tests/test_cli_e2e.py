"""Full-loop CLI integration on a fabricated mini-KITTI tree: train ->
checkpoint -> eigen evaluation (dense + sparse) -> single-image infer,
all through the real CLI mains with the real on-disk formats (split
files shadowing the vendored ones via <data_path>/splits, gt_depths.npz,
msgpack checkpoints + meta.json). This is the wiring the unit tests
can't see: readlines -> dataset -> epoch loop -> save_checkpoint ->
_load_forward -> predict_disps -> evaluate_disps -> format_result_table.
"""

import os

import numpy as np
import pytest
from PIL import Image

DRIVE = "2011_09_26/2011_09_26_drive_0001_sync"
H_SRC, W_SRC = 96, 320


@pytest.fixture(scope="module")
def mini_kitti(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_e2e")
    rng = np.random.RandomState(0)
    for side in (2, 3):
        d = root / DRIVE / f"image_0{side}" / "data"
        d.mkdir(parents=True)
        for f in range(4):
            arr = rng.randint(0, 255, (H_SRC, W_SRC, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{f:010d}.jpg")

    # split files shadow the vendored ones (resolution order prefers
    # <data_path>/splits)
    tr = root / "splits" / "eigen_zhou"
    tr.mkdir(parents=True)
    (tr / "train_files.txt").write_text(
        "".join(f"{DRIVE} {f} l\n" for f in range(4)))
    (tr / "val_files.txt").write_text(
        f"{DRIVE} 1 l\n{DRIVE} 2 r\n")
    ev = root / "splits" / "eigen"
    ev.mkdir(parents=True)
    (ev / "test_files.txt").write_text(
        f"{DRIVE} 1 l\n{DRIVE} 2 l\n")
    gt = np.empty(2, object)
    for i in range(2):
        gt[i] = (rng.rand(H_SRC, W_SRC).astype(np.float64) * 60 + 2)
    np.savez_compressed(ev / "gt_depths.npz", data=gt)
    return str(root)


@pytest.fixture(scope="module")
def trained_ckpt(mini_kitti, tmp_path_factory):
    from wavelet_monodepth_tpu.tools.train_kitti import main as train_main
    log_dir = str(tmp_path_factory.mktemp("logs"))
    train_main(["--data_path", mini_kitti, "--log_dir", log_dir,
                "--model_name", "mini", "--split", "eigen_zhou",
                "--height", "64", "--width", "96",
                "--batch_size", "2", "--num_epochs", "1",
                "--use_stereo", "--frame_ids", "0", "--use_wavelets",
                "--log_frequency", "1", "--save_frequency", "1",
                "--num_layers", "18"])
    folder = os.path.join(log_dir, "mini", "models", "weights_0")
    assert os.path.exists(os.path.join(folder, "state.msgpack"))
    assert os.path.exists(os.path.join(folder, "meta.json"))
    # opt.json sits next to the weights folders (`trainer.py:722-731`)
    assert os.path.exists(os.path.join(log_dir, "mini", "models",
                                       "opt.json"))
    return folder


def test_train_then_evaluate_dense(mini_kitti, trained_ckpt, capsys):
    from wavelet_monodepth_tpu.tools.evaluate_depth import main as ev_main
    ev_main(["--data_path", mini_kitti, "--eval_split", "eigen",
             "--eval_stereo", "--use_wavelets",
             "--height", "64", "--width", "96", "--batch_size", "2",
             "--load_weights_folder", trained_ckpt,
             "--num_layers", "18"])
    out = capsys.readouterr().out
    assert "abs_rel" in out and "Done!" in out
    # the 7 metrics in the table row are finite numbers
    row = [ln for ln in out.splitlines() if "&" in ln and "abs_rel"
           not in ln][-1]
    vals = [float(v) for v in row.replace("\\\\", "").split("&")
            if v.strip()]
    assert len(vals) == 7 and np.isfinite(vals).all()


def test_train_then_evaluate_sparse(mini_kitti, trained_ckpt, capsys):
    from wavelet_monodepth_tpu.tools.evaluate_depth import main as ev_main
    ev_main(["--data_path", mini_kitti, "--eval_split", "eigen",
             "--eval_stereo", "--use_wavelets", "--use_sparse",
             "--threshold", "0.1",
             "--height", "64", "--width", "96", "--batch_size", "2",
             "--load_weights_folder", trained_ckpt,
             "--num_layers", "18"])
    out = capsys.readouterr().out
    assert "total_ops" in out and "density" in out
    assert "abs_rel" in out and "Done!" in out


def test_orbax_checkpoint_backend_end_to_end(mini_kitti,
                                             tmp_path_factory, capsys):
    """--checkpoint_backend orbax: train writes an OCDBT dir and the
    eval CLI auto-detects it (no msgpack present)."""
    from wavelet_monodepth_tpu.tools.evaluate_depth import main as ev_main
    from wavelet_monodepth_tpu.tools.train_kitti import main as train_main
    log_dir = str(tmp_path_factory.mktemp("orbax_logs"))
    train_main(["--data_path", mini_kitti, "--log_dir", log_dir,
                "--model_name", "mini_orbax", "--split", "eigen_zhou",
                "--height", "64", "--width", "96",
                "--batch_size", "2", "--num_epochs", "1",
                "--use_stereo", "--frame_ids", "0", "--use_wavelets",
                "--log_frequency", "999", "--save_frequency", "1",
                "--num_layers", "18", "--checkpoint_backend", "orbax"])
    folder = os.path.join(log_dir, "mini_orbax", "models", "weights_0")
    assert os.path.isdir(os.path.join(folder, "state.orbax"))
    assert not os.path.exists(os.path.join(folder, "state.msgpack"))
    ev_main(["--data_path", mini_kitti, "--eval_split", "eigen",
             "--eval_stereo", "--use_wavelets",
             "--height", "64", "--width", "96", "--batch_size", "2",
             "--load_weights_folder", folder, "--num_layers", "18"])
    out = capsys.readouterr().out
    assert "abs_rel" in out and "Done!" in out


def test_auto_resume_continues_from_latest(mini_kitti, trained_ckpt,
                                           capsys):
    """--auto_resume: with weights_0 already on disk (trained_ckpt),
    rerunning the SAME command with --num_epochs 2 restores it, starts
    at epoch 1, and writes weights_1 — crash/preemption recovery with
    no manual --load_weights_folder/--start_epoch bookkeeping."""
    from wavelet_monodepth_tpu.tools.train_kitti import main as train_main
    log_dir = os.path.dirname(os.path.dirname(
        os.path.dirname(trained_ckpt)))
    train_main(["--data_path", mini_kitti, "--log_dir", log_dir,
                "--model_name", "mini", "--split", "eigen_zhou",
                "--height", "64", "--width", "96",
                "--batch_size", "2", "--num_epochs", "2",
                "--use_stereo", "--frame_ids", "0", "--use_wavelets",
                "--log_frequency", "999", "--save_frequency", "1",
                "--num_layers", "18", "--auto_resume"])
    out = capsys.readouterr().out
    assert "auto-resume: restoring" in out and "weights_0" in out
    assert "continuing at epoch 1" in out
    assert os.path.exists(os.path.join(
        os.path.dirname(trained_ckpt), "weights_1", "state.msgpack"))


def test_evaluate_dense_native_decode(mini_kitti, trained_ckpt, capsys):
    """--native_decode feeds eval via the C++ threaded decoder
    (native/wmd_native.cpp) instead of per-item PIL; metrics must stay
    finite and the table shape identical."""
    from wavelet_monodepth_tpu.data import native_loader
    if not native_loader.available():
        import subprocess
        subprocess.run(["bash", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "native", "build.sh")], check=True)
    from wavelet_monodepth_tpu.tools.evaluate_depth import main as ev_main
    ev_main(["--data_path", mini_kitti, "--eval_split", "eigen",
             "--eval_stereo", "--use_wavelets", "--native_decode",
             "--height", "64", "--width", "96", "--batch_size", "2",
             "--load_weights_folder", trained_ckpt,
             "--num_layers", "18"])
    out = capsys.readouterr().out
    assert "abs_rel" in out and "Done!" in out


def test_training_logs_visuals_to_tensorboard(trained_ckpt):
    """`trainer.py:661-720` parity: the train/val event files carry
    image tags (disparities, wavelet coefficients) and coefficient
    histograms, not just loss scalars."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)
    model_dir = os.path.dirname(os.path.dirname(trained_ckpt))
    for mode in ("train", "val"):
        acc = EventAccumulator(os.path.join(model_dir, mode))
        acc.Reload()
        tags = acc.Tags()
        assert any(t.startswith("disp_") for t in tags["images"]), tags
        assert any("LH_" in t or "LL_" in t for t in tags["images"])
        assert any(t.startswith("hist_") for t in tags["histograms"])
        assert len(tags["scalars"]) > 0


def test_infer_from_trained_checkpoint(mini_kitti, trained_ckpt):
    from wavelet_monodepth_tpu.tools.infer import main as infer_main
    img = os.path.join(mini_kitti, DRIVE, "image_02", "data",
                       "0000000001.jpg")
    infer_main(["--image_path", img, "--model_path", trained_ckpt,
                "--ext", "jpg"])
    base = img[:-4]
    disp = np.load(base + "_disp.npy")
    assert disp.shape == (1, 1, 64, 96) and np.isfinite(disp).all()
    assert os.path.exists(base + "_disp.jpeg")
    for s in range(4):
        assert os.path.exists(f"{base}_scale_{s}_wavelets.npy")


def test_train_cli_data_parallel(mini_kitti, tmp_path_factory):
    """--data_axis 2 through the real CLI main: mesh build, replicated
    restore-free init, pre-sharded prefetch feed, sharded step, visuals
    logging off sharded arrays, checkpoint of the replicated state —
    the wiring the step-level mesh tests can't see."""
    from wavelet_monodepth_tpu.tools.train_kitti import main as train_main
    log_dir = str(tmp_path_factory.mktemp("dp_logs"))
    train_main(["--data_path", mini_kitti, "--log_dir", log_dir,
                "--model_name", "dp", "--split", "eigen_zhou",
                "--height", "64", "--width", "96",
                "--batch_size", "2", "--num_epochs", "1",
                "--use_stereo", "--frame_ids", "0", "--use_wavelets",
                "--log_frequency", "1", "--save_frequency", "1",
                "--data_axis", "2"])
    folder = os.path.join(log_dir, "dp", "models", "weights_0")
    assert os.path.exists(os.path.join(folder, "state.msgpack"))
    # the saved state must be host-complete (device_get of replicated
    # arrays), loadable into a fresh single-device setup
    from wavelet_monodepth_tpu.train.kitti import KittiTrainSetup
    from wavelet_monodepth_tpu.utils import checkpoint as ckpt
    from wavelet_monodepth_tpu.utils.config import KittiOptions
    import jax
    opts = KittiOptions(use_stereo=True, frame_ids=(0,), height=64,
                        width=96, use_wavelets=True)
    setup = KittiTrainSetup(opts, steps_per_epoch=10)
    restored = ckpt.load_checkpoint(
        folder, setup.init_state(jax.random.PRNGKey(0)))
    assert int(restored.step) > 0


def test_train_cli_steps_per_call(mini_kitti, tmp_path_factory):
    """--steps_per_call 2 through the real CLI main (with --data_axis 2
    so the stacked [K, B, ...] feed also exercises
    stacked_batch_sharding): host batch stacking, one scan dispatch per
    2 steps, last-sub-step scalar/visual logging, checkpoint save."""
    from wavelet_monodepth_tpu.tools.train_kitti import main as train_main
    log_dir = str(tmp_path_factory.mktemp("spc_logs"))
    train_main(["--data_path", mini_kitti, "--log_dir", log_dir,
                "--model_name", "spc", "--split", "eigen_zhou",
                "--height", "64", "--width", "96",
                "--batch_size", "2", "--num_epochs", "1",
                "--use_stereo", "--frame_ids", "0", "--use_wavelets",
                "--log_frequency", "1", "--save_frequency", "1",
                "--data_axis", "2", "--steps_per_call", "2"])
    folder = os.path.join(log_dir, "spc", "models", "weights_0")
    assert os.path.exists(os.path.join(folder, "state.msgpack"))
    ev = os.path.join(log_dir, "spc", "train")
    assert any("tfevents" in f for f in os.listdir(ev))

"""Full-loop NYU CLI integration: train_nyu on a fabricated nyu_data.zip
-> checkpoint -> evaluate_nyu against a fabricated
nyu_depth_v2_labeled.mat (h5py, the real v7.3 layout: images (N,3,W,H) /
depths (N,W,H) in mat axis order) + splits.mat testNdxs. mobilenet_light
at 224x224 keeps CPU compile/runtime small while exercising the same
wiring as the published densenet161/480x640 config.
"""

import io
import os
import zipfile

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def nyu_zip(tmp_path_factory):
    root = tmp_path_factory.mktemp("nyu_e2e")
    path = root / "nyu_data.zip"
    rng = np.random.RandomState(3)
    with zipfile.ZipFile(path, "w") as zf:
        rows = []
        for i in range(4):
            img = Image.fromarray(rng.randint(0, 255, (480, 640, 3),
                                              dtype=np.uint8))
            dep = Image.fromarray(
                (rng.rand(480, 640) * 255).astype(np.uint8))
            ib, db = io.BytesIO(), io.BytesIO()
            img.save(ib, "PNG")
            dep.save(db, "PNG")
            zf.writestr(f"data/img_{i}.png", ib.getvalue())
            zf.writestr(f"data/dep_{i}.png", db.getvalue())
            rows.append(f"data/img_{i}.png,data/dep_{i}.png")
        zf.writestr("data/nyu2_train.csv", "\n".join(rows))
    return str(path)


@pytest.fixture(scope="module")
def nyu_mat(tmp_path_factory):
    import h5py
    root = tmp_path_factory.mktemp("nyu_mat")
    rng = np.random.RandomState(4)
    data_path = str(root / "nyu_depth_v2_labeled.mat")
    with h5py.File(data_path, "w") as f:
        # mat v7.3 axis order: images (N, 3, W, H), depths (N, W, H)
        f["images"] = rng.randint(0, 255, (3, 3, 640, 480),
                                  dtype=np.uint8)
        f["depths"] = (rng.rand(3, 640, 480) * 8 + 1
                       ).astype(np.float32)
    splits_path = str(root / "splits.mat")
    from scipy.io import savemat
    savemat(splits_path, {"testNdxs": np.array([[1], [3]]),
                          "trainNdxs": np.array([[2]])})
    return data_path, splits_path


@pytest.fixture(scope="module")
def trained_nyu_ckpt(nyu_zip, tmp_path_factory):
    from wavelet_monodepth_tpu.tools.train_nyu import main as train_main
    log_dir = str(tmp_path_factory.mktemp("nyu_logs"))
    train_main(["--data_path", nyu_zip, "--log_dir", log_dir,
                "--model_name", "mini", "--encoder_type",
                "mobilenet_light", "--use_wavelets", "--use_224",
                "--batch_size", "2", "--epochs", "1",
                "--log_frequency", "1"])
    folder = os.path.join(log_dir, "mini", "models", "weights_0")
    assert os.path.exists(os.path.join(folder, "state.msgpack"))
    return folder


def test_nyu_auto_resume_continues_from_latest(nyu_zip,
                                               trained_nyu_ckpt, capsys):
    """--auto_resume on the NYU CLI: restores weights_0 and trains only
    the remaining epoch, writing weights_1."""
    from wavelet_monodepth_tpu.tools.train_nyu import main as train_main
    log_dir = os.path.dirname(os.path.dirname(
        os.path.dirname(trained_nyu_ckpt)))
    train_main(["--data_path", nyu_zip, "--log_dir", log_dir,
                "--model_name", "mini", "--encoder_type",
                "mobilenet_light", "--use_wavelets", "--use_224",
                "--batch_size", "2", "--epochs", "2",
                "--log_frequency", "999", "--auto_resume"])
    out = capsys.readouterr().out
    assert "auto-resume: restoring" in out and "weights_0" in out
    assert os.path.exists(os.path.join(
        os.path.dirname(trained_nyu_ckpt), "weights_1",
        "state.msgpack"))


def test_nyu_training_logs_coefficient_visuals(trained_nyu_ckpt):
    """`NYUv2/train.py:113-163` parity: pred AND gt wavelet-coefficient
    images + histograms reach the event files."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)
    model_dir = os.path.dirname(os.path.dirname(trained_nyu_ckpt))
    for mode in ("train", "val"):
        acc = EventAccumulator(os.path.join(model_dir, mode))
        acc.Reload()
        tags = acc.Tags()
        assert any(t.endswith("_pred/0") and "hist" not in t
                   for t in tags["images"]), tags
        assert any(t.endswith("_gt/0") and "hist" not in t
                   for t in tags["images"])
        assert any(t.startswith("hist_") and t.endswith("_pred/0")
                   for t in tags["histograms"])
        assert any(t.startswith("hist_") and t.endswith("_gt/0")
                   for t in tags["histograms"])


def test_nyu_train_then_evaluate(nyu_mat, trained_nyu_ckpt, capsys):
    from wavelet_monodepth_tpu.tools.evaluate_nyu import main as ev_main
    data_path, splits_path = nyu_mat
    ev_main(["--data_path", data_path, "--splits_path", splits_path,
             "--load_weights_folder", trained_nyu_ckpt,
             "--encoder_type", "mobilenet_light", "--use_wavelets",
             "--use_224"])
    out = capsys.readouterr().out
    assert "rel" in out
    nums = [float(t) for t in out.replace("&", " ").split()
            if t.replace(".", "").replace("-", "").isdigit()]
    assert len(nums) >= 6 and np.isfinite(nums).all()


def test_nyu_evaluate_sparse_with_edges(nyu_mat, tmp_path, capsys):
    """Sparse decode + the NYUv2-OC++ edge-metric path (eps_acc /
    eps_comp via the exact Canny + truncated chamfer). Sparse NYU
    decoding only exists at 480x640 (like the reference's model.py), so
    this runs the full-size pipeline with fresh-init weights."""
    from wavelet_monodepth_tpu.tools.evaluate_nyu import main as ev_main
    data_path, splits_path = nyu_mat
    edges = tmp_path / "edges"
    edges.mkdir()
    rng = np.random.RandomState(5)
    for i in range(1, 3):
        Image.fromarray(
            (rng.rand(480, 640) > 0.97).astype(np.uint8) * 255
        ).save(edges / f"{i:04d}.png")
    ev_main(["--data_path", data_path, "--splits_path", splits_path,
             "--encoder_type", "mobilenet_light", "--use_wavelets",
             "--use_sparse", "--threshold", "0.05",
             "--edges_dir", str(edges)])
    out = capsys.readouterr().out
    assert "eps_acc" in out and "eps_comp" in out


def test_nyu_train_cli_data_parallel(nyu_zip, tmp_path_factory):
    """--data_axis 2 through the NYU CLI main: sharded prefetch feed,
    sharded step, log-path expansion of sharded uint8 batches,
    checkpoint of the replicated state."""
    from wavelet_monodepth_tpu.tools.train_nyu import main as train_main
    log_dir = str(tmp_path_factory.mktemp("nyu_dp_logs"))
    train_main(["--data_path", nyu_zip, "--log_dir", log_dir,
                "--model_name", "dp", "--encoder_type",
                "mobilenet_light", "--use_wavelets", "--use_224",
                "--batch_size", "2", "--epochs", "1",
                "--log_frequency", "1", "--data_axis", "2"])
    assert os.path.exists(os.path.join(
        log_dir, "dp", "models", "weights_0", "state.msgpack"))


def test_evaluate_adopts_normalize_input_from_opt_json(tmp_path, capsys):
    """A checkpoint trained with normalize_input=True (the pre-round-4
    in-repo default — real ImageNet normalization, a documented
    deviation) must be evaluated the way it was trained: the eval CLI
    adopts the setting from the run's saved opt.json; the CLI flag and
    reference checkpoints (no opt.json) are unaffected."""
    import json

    from wavelet_monodepth_tpu.tools.evaluate_nyu import \
        adopt_normalize_input

    models = tmp_path / "models"
    weights = models / "weights_3"
    weights.mkdir(parents=True)
    (models / "opt.json").write_text(json.dumps(
        {"normalize_input": True, "encoder_type": "densenet"}))
    assert adopt_normalize_input(str(weights), False) is True
    out = capsys.readouterr().out
    assert "adopting normalize_input=True" in out

    (models / "opt.json").write_text(json.dumps(
        {"normalize_input": False}))
    assert adopt_normalize_input(str(weights), False) is False
    # no opt.json (reference export / hand-assembled folder): CLI wins
    (models / "opt.json").unlink()
    assert adopt_normalize_input(str(weights), False) is False
    assert adopt_normalize_input(str(weights), True) is True
    assert adopt_normalize_input(None, False) is False

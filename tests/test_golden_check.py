"""golden_check pre-flight validator: green on fabricated mini-mounts,
actionable on broken/absent ones (GOLDEN_GATES.md runbook; the gates
themselves live in test_integration_data.py)."""

import io
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from PIL import Image  # noqa: E402

from wavelet_monodepth_tpu.tools import golden_check as gc  # noqa: E402

from test_torch_import import _resnet18_sd, _wavelet_decoder_sd  # noqa: E402

DRIVE = "2011_09_26/2011_09_26_drive_0001_sync"


def _save_pth(path, sd):
    torch.save({k: torch.as_tensor(v) if not isinstance(v, int) else v
                for k, v in sd.items()}, path)


# ---------------------------------------------------------------------------
# absent mounts
# ---------------------------------------------------------------------------

def test_absent_mounts_are_reported_not_fatal(capsys):
    failures = gc.run_checks(env={})
    out = capsys.readouterr().out
    assert failures == 0
    for var, _, _ in gc.MOUNTS:
        assert f"[ -- ] {var}" in out
    assert "GOLDEN_GATES.md" in out


def test_require_all_makes_absent_fatal(monkeypatch, capsys):
    for var, _, _ in gc.MOUNTS:
        monkeypatch.delenv(var, raising=False)
    assert gc.main([]) == 0
    assert gc.main(["--require_all"]) == 1


# ---------------------------------------------------------------------------
# KITTI raw data mount
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mini_kitti(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_gc")
    rng = np.random.RandomState(0)
    d = root / DRIVE / "image_02" / "data"
    d.mkdir(parents=True)
    for f in (1, 2):
        arr = rng.randint(0, 255, (96, 320, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"{f:010d}.jpg")
    ev = root / "splits" / "eigen"
    ev.mkdir(parents=True)
    (ev / "test_files.txt").write_text(f"{DRIVE} 1 l\n{DRIVE} 2 l\n")
    gt = np.empty(2, object)
    for i in range(2):
        gt[i] = rng.rand(96, 320) * 60 + 2
    np.savez_compressed(ev / "gt_depths.npz", data=gt)
    return str(root)


def test_kitti_data_mount_validates(mini_kitti):
    assert gc.check_kitti_data(mini_kitti) == []


def test_kitti_data_missing_gt_is_actionable(mini_kitti, tmp_path):
    import shutil
    broken = tmp_path / "kitti"
    shutil.copytree(mini_kitti, broken)
    os.remove(broken / "splits" / "eigen" / "gt_depths.npz")
    probs = gc.check_kitti_data(str(broken))
    assert any("export_gt_depth" in p for p in probs)


def test_kitti_data_missing_image_named(mini_kitti, tmp_path):
    import shutil
    broken = tmp_path / "kitti"
    shutil.copytree(mini_kitti, broken)
    os.remove(broken / DRIVE / "image_02" / "data" / "0000000002.jpg")
    probs = gc.check_kitti_data(str(broken))
    assert any("0000000002" in p for p in probs)


# ---------------------------------------------------------------------------
# KITTI weights mount
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def kitti_weights(tmp_path_factory):
    folder = tmp_path_factory.mktemp("kitti_w")
    _save_pth(folder / "encoder.pth", _resnet18_sd())
    _save_pth(folder / "depth.pth", _wavelet_decoder_sd())
    return str(folder)


def test_kitti_weights_mount_validates(kitti_weights):
    assert gc.check_kitti_weights(kitti_weights, 18, 192, 640) == []


def test_kitti_weights_wrong_feed_size_fails(kitti_weights):
    probs = gc.check_kitti_weights(kitti_weights, 18, 320, 1024)
    assert any("height=192" in p for p in probs)


def test_kitti_weights_wrong_depth_fails(kitti_weights):
    probs = gc.check_kitti_weights(kitti_weights, 50, 192, 640)
    assert any("resnet18" in p and "resnet50" in p for p in probs)


def test_kitti_weights_missing_file_named(tmp_path):
    _save_pth(tmp_path / "encoder.pth", _resnet18_sd())
    probs = gc.check_kitti_weights(str(tmp_path), 18, 192, 640)
    assert any("depth.pth" in p for p in probs)


def test_kitti_weights_missing_key_named(tmp_path):
    sd = _resnet18_sd()
    del sd["encoder.layer4.1.conv2.weight"]
    _save_pth(tmp_path / "encoder.pth", sd)
    _save_pth(tmp_path / "depth.pth", _wavelet_decoder_sd())
    probs = gc.check_kitti_weights(str(tmp_path), 18, 192, 640)
    assert probs and any("layer4" in p for p in probs)


# ---------------------------------------------------------------------------
# pose mounts
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pose_weights(tmp_path_factory):
    folder = tmp_path_factory.mktemp("pose_w")
    # pair-input resnet18 pose encoder: raw torchvision names (prefix ''),
    # conv1 takes 6 channels
    sd = {k[len("encoder."):]: v for k, v in _resnet18_sd().items()
          if k.startswith("encoder.")}
    rng = np.random.RandomState(1)
    sd["conv1.weight"] = rng.randn(64, 6, 7, 7).astype(np.float32) * 0.05
    _save_pth(folder / "pose_encoder.pth", sd)

    # pose decoder: export our flax init through the real exporter
    # (round-trip-tested in test_torch_export.py)
    from wavelet_monodepth_tpu.models.pose import PoseDecoder
    from wavelet_monodepth_tpu.models.resnet import (ResnetEncoder,
                                                     num_ch_enc)
    from wavelet_monodepth_tpu.tools import torch_import as ti
    rngk = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 6), jnp.float32)
    enc = ResnetEncoder(num_layers=18, num_input_images=2)
    ev = enc.init(rngk, x)
    dec = PoseDecoder(num_ch_enc=num_ch_enc(18), num_input_features=1,
                      num_frames_to_predict_for=2)
    dv = dec.init(rngk, [enc.apply(ev, x)])
    _save_pth(folder / "pose.pth", ti.export_pose_decoder(dv))
    return str(folder)


def test_pose_weights_mount_validates(pose_weights):
    assert gc.check_pose_weights(pose_weights) == []


def test_pose_weights_single_image_encoder_fails(tmp_path, pose_weights):
    import shutil
    sd = {k[len("encoder."):]: v for k, v in _resnet18_sd().items()
          if k.startswith("encoder.")}
    _save_pth(tmp_path / "pose_encoder.pth", sd)   # 3-channel conv1
    shutil.copy(os.path.join(pose_weights, "pose.pth"),
                tmp_path / "pose.pth")
    probs = gc.check_pose_weights(str(tmp_path))
    assert any("6" in p and "input channels" in p for p in probs)


@pytest.fixture(scope="module")
def odom_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("odom_gc")
    rng = np.random.RandomState(0)
    for seq in (9, 10):
        d = root / f"sequences/{seq:02d}" / "image_2"
        d.mkdir(parents=True)
        Image.fromarray(rng.randint(0, 255, (64, 96, 3),
                                    dtype=np.uint8)).save(
            d / "000000.png")
        poses = root / "poses"
        poses.mkdir(exist_ok=True)
        np.savetxt(poses / f"{seq:02d}.txt", rng.randn(5, 12))
    return str(root)


def test_odom_mount_validates(odom_tree):
    assert gc.check_odom_data(odom_tree) == []


def test_odom_missing_poses_named(odom_tree, tmp_path):
    import shutil
    broken = tmp_path / "odom"
    shutil.copytree(odom_tree, broken)
    os.remove(broken / "poses" / "10.txt")
    probs = gc.check_odom_data(str(broken))
    assert any("10.txt" in p for p in probs)


# ---------------------------------------------------------------------------
# NYU mounts
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def nyu_mat(tmp_path_factory):
    import h5py
    root = tmp_path_factory.mktemp("nyu_gc")
    data_path = str(root / "nyu_depth_v2_labeled.mat")
    rng = np.random.RandomState(0)
    with h5py.File(data_path, "w") as f:
        f["images"] = rng.randint(0, 255, (4, 3, 96, 64), dtype=np.uint8)
        f["depths"] = rng.rand(4, 96, 64).astype(np.float32) * 9 + 1
    splits_path = str(root / "splits.mat")
    from scipy.io import savemat
    savemat(splits_path, {"testNdxs": np.array([[1], [3]]),
                          "trainNdxs": np.array([[2], [4]])})
    return data_path, splits_path


def test_nyu_mat_and_splits_validate(nyu_mat, monkeypatch):
    data_path, splits_path = nyu_mat
    assert gc.check_nyu_mat(data_path) == []
    monkeypatch.setenv("WMD_NYU_MAT", data_path)
    assert gc.check_nyu_splits(splits_path, data_path) == []


def test_nyu_splits_out_of_range_fails(nyu_mat, tmp_path):
    data_path, _ = nyu_mat
    from scipy.io import savemat
    bad = str(tmp_path / "splits.mat")
    savemat(bad, {"testNdxs": np.array([[1], [99]])})
    probs = gc.check_nyu_splits(bad, data_path)
    assert any("99" in p for p in probs)


@pytest.fixture(scope="module")
def nyu_weights(tmp_path_factory):
    """Fabricate a reference-layout model.pth: real torchvision-named
    densenet161 features (the parity suite's _tv_densenet161 twin) under
    'encoder.original_model.features.', plus a DecoderWave state dict
    produced by the real exporter (round-trip-tested elsewhere)."""
    from test_reference_parity import _tv_densenet161
    from wavelet_monodepth_tpu.models.decoders_nyu import NyuDecoderWave
    from wavelet_monodepth_tpu.models.densenet import (DenseNet161Encoder,
                                                       NUM_CH_ENC)
    from wavelet_monodepth_tpu.tools import torch_import as ti

    sd = {}
    torch.manual_seed(0)
    tv = _tv_densenet161()
    for k, v in tv.features.state_dict().items():
        if "num_batches_tracked" in k:
            continue
        sd[f"encoder.original_model.features.{k}"] = v.numpy()

    rngk = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    enc = DenseNet161Encoder(normalize_input=False)
    ev = enc.init(rngk, x)
    dec = NyuDecoderWave(num_ch_enc=tuple(NUM_CH_ENC), decoder_width=0.5)
    dv = dec.init(rngk, enc.apply(ev, x))
    sd.update(ti.export_nyu_wave_decoder(dv))

    path = tmp_path_factory.mktemp("nyu_w") / "model.pth"
    _save_pth(path, sd)
    return str(path)


def test_nyu_weights_mount_validates(nyu_weights):
    assert gc.check_nyu_weights(nyu_weights) == []


def test_nyu_weights_missing_decoder_key_named(nyu_weights, tmp_path):
    sd = torch.load(nyu_weights, map_location="cpu", weights_only=False)
    del sd["decoder.wave2.conv.weight"]
    path = tmp_path / "model.pth"
    torch.save(sd, path)
    probs = gc.check_nyu_weights(str(path))
    assert any("wave2" in p for p in probs)


def test_nyu_edges_mount(tmp_path):
    probs = gc.check_nyu_edges(str(tmp_path))
    assert probs   # empty dir: no edge pngs
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(tmp_path / "0001.png")
    assert gc.check_nyu_edges(str(tmp_path)) == []


# ---------------------------------------------------------------------------
# whole-command smoke: fabricated KITTI mounts through run_checks
# ---------------------------------------------------------------------------

def test_run_checks_mixed(mini_kitti, kitti_weights, capsys):
    env = {"WMD_KITTI_DATA": mini_kitti,
           "WMD_KITTI_WEIGHTS": kitti_weights,
           "WMD_KITTI_WEIGHTS_R50": kitti_weights}   # wrong depth: FAIL
    buf = io.StringIO()
    failures = gc.run_checks(env=env, out=buf)
    out = buf.getvalue()
    assert failures == 1
    assert "[ OK ] WMD_KITTI_DATA" in out
    assert "[ OK ] WMD_KITTI_WEIGHTS " in out
    assert "[FAIL] WMD_KITTI_WEIGHTS_R50" in out

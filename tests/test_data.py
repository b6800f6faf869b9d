"""Data-pipeline tests on synthetic on-disk fixtures: a mini KITTI tree
(jpgs + calib + velodyne + depth hints) and a mini NYU zip."""

import io
import os
import zipfile

import numpy as np
import pytest
from PIL import Image

from wavelet_monodepth_tpu.data import kitti as kitti_data
from wavelet_monodepth_tpu.data import kitti_utils
from wavelet_monodepth_tpu.data import nyu as nyu_data


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    drive = "2011_09_26/2011_09_26_drive_0001_sync"
    rng = np.random.RandomState(0)
    for side in (2, 3):
        d = root / drive / f"image_0{side}" / "data"
        d.mkdir(parents=True)
        for f in range(3):
            arr = rng.randint(0, 255, (96, 320, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{f:010d}.jpg")
    # depth hints for frame 1, left image
    hints = root / "depth_hints" / drive / "image_02"
    hints.mkdir(parents=True)
    np.save(hints / f"{1:010d}.npy",
            rng.rand(1, 96, 320).astype(np.float32) * 50 + 1)
    return str(root), drive


def test_kitti_dataset_stereo_hints(kitti_tree):
    root, drive = kitti_tree
    ds = kitti_data.KittiRawDataset(
        root, [f"{drive} 1 l"], height=64, width=96,
        frame_idxs=[0, "s"], is_train=True, use_depth_hints=True)
    item = ds[0]
    assert item[("color", "0", 0)].shape == (64, 96, 3)
    assert item[("color", "s", 2)].shape == (16, 24, 3)
    assert item[("color_aug", "0", 0)].dtype == np.float32
    assert item[("stereo_T",)].shape == (4, 4)
    assert abs(abs(item[("stereo_T",)][0, 3]) - 0.1) < 1e-6
    assert item[("depth_hint",)].shape == (64, 96, 1)
    assert item[("K", 1)][0, 2] == pytest.approx(0.5 * 48)
    # intrinsics invert correctly
    KI = item[("K", 0)] @ item[("inv_K", 0)]
    np.testing.assert_allclose(KI, np.eye(4), atol=1e-4)


def test_kitti_missing_hint_zero_mask(kitti_tree):
    root, drive = kitti_tree
    ds = kitti_data.KittiRawDataset(
        root, [f"{drive} 0 l"], height=64, width=96,
        frame_idxs=[0, "s"], is_train=False, use_depth_hints=True)
    item = ds[0]   # frame 0 has no hint file
    assert float(item[("depth_hint_mask",)].sum()) == 0.0


def test_kitti_batch_iterator(kitti_tree):
    root, drive = kitti_tree
    files = [f"{drive} 0 l", f"{drive} 1 l", f"{drive} 2 l"]
    ds = kitti_data.KittiRawDataset(root, files, 64, 96, [0, "s"],
                                    is_train=True)
    it = kitti_data.batch_iterator(ds, 2, seed=0)
    batch = next(it)
    assert batch[("color", "0", 0)].shape == (2, 64, 96, 3)


def test_velodyne_projection(tmp_path):
    """generate_depth_map on a synthetic calib + 2 points."""
    calib = tmp_path
    (calib / "calib_cam_to_cam.txt").write_text(
        "S_rect_02: 320 96\n"
        "R_rect_00: 1 0 0 0 1 0 0 0 1\n"
        "P_rect_02: 100 0 160 0 0 100 48 0 0 0 1 0\n")
    (calib / "calib_velo_to_cam.txt").write_text(
        "R: 0 -1 0 0 0 -1 1 0 0\n"
        "T: 0 0 0\n")
    # velodyne: x forward, y left, z up; point 10m ahead -> center pixel
    pts = np.array([[10.0, 0.0, 0.0, 1.0],
                    [10.0, 0.0, 0.0, 1.0]], dtype=np.float32)
    velo_file = tmp_path / "velo.bin"
    pts.astype(np.float32).tofile(velo_file)
    depth = kitti_utils.generate_depth_map(str(calib), str(velo_file))
    assert depth.shape == (96, 320)
    ys, xs = np.nonzero(depth)
    assert len(ys) == 1
    assert depth[ys[0], xs[0]] == pytest.approx(10.0, rel=1e-3)


@pytest.fixture(scope="module")
def nyu_zip(tmp_path_factory):
    root = tmp_path_factory.mktemp("nyu")
    path = root / "nyu_data.zip"
    rng = np.random.RandomState(0)
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


def test_nyu_dataset(nyu_zip):
    train, test = nyu_data.get_training_testing_data(nyu_zip)
    assert len(train) == 4
    item = train[0]
    assert item["image"].shape == (480, 640, 3)
    assert item["depth"].shape == (240, 320, 1)
    assert item["depth"].min() >= 10.0 and item["depth"].max() <= 1000.0
    # the reference's "testing" loader also scales x1000 (is_test=False
    # in getTrainingTestingData, data.py:216-223); the /1000 path is only
    # used by evaluate.py
    t_item = test[0]
    assert 10.0 <= t_item["depth"].max() <= 1000.0
    # is_test: /1000 then the same [10, 1000] clamp — the reference
    # clamps BOTH branches (`data.py:132-139`), so 8-bit depth maps
    # land pinned at the clamp floor
    real_test = nyu_data.NyuDepthDataset(test.data, test.pairs,
                                         is_train=False, is_test=True)
    assert float(real_test[0]["depth"].min()) == 10.0
    assert float(real_test[0]["depth"].max()) == 10.0


def test_nyu_batch_iterator(nyu_zip):
    train, _ = nyu_data.get_training_testing_data(nyu_zip)
    it = nyu_data.batch_iterator(train, 2, epochs=1)
    batch = next(it)
    assert batch["image"].shape == (2, 480, 640, 3)
    assert batch["depth"].shape == (2, 240, 320, 1)


def test_prefetch_to_device():
    import jax
    import jax.numpy as jnp
    from wavelet_monodepth_tpu.data import prefetch

    batches = [{"a": np.full((2, 4), float(i), np.float32)}
               for i in range(5)]
    out = list(prefetch.to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["a"], jax.Array)
        np.testing.assert_allclose(np.asarray(b["a"]), float(i))


def test_prefetch_sharded():
    import jax
    from wavelet_monodepth_tpu.parallel import mesh as mesh_lib
    from wavelet_monodepth_tpu.data import prefetch

    m = mesh_lib.make_mesh(data=8)
    sh = mesh_lib.batch_sharding(m)
    batches = [{"a": np.ones((8, 4), np.float32)}]
    out = list(prefetch.to_device(iter(batches), sharding=sh))
    assert len(out[0]["a"].sharding.device_set) == 8


def test_nyu_16bit_depth_keeps_raw_values():
    """The reference's to_tensor (`data.py:142-173`) divides only BYTE
    images by 255; 'I'/'I;16' depth PNGs (millimetre ints) pass through
    raw. 8-bit depth still divides."""
    from PIL import Image

    from wavelet_monodepth_tpu.data.nyu import _depth_to_float

    a = (np.arange(12, dtype=np.uint16).reshape(3, 4) * 300)
    img16 = Image.fromarray(a.astype(np.int32), mode="I")
    out = _depth_to_float(img16)
    np.testing.assert_allclose(out[..., 0], a.astype(np.float32))

    img8 = Image.fromarray((np.arange(12, dtype=np.uint8)
                            ).reshape(3, 4), mode="L")
    out8 = _depth_to_float(img8)
    np.testing.assert_allclose(
        out8[..., 0], np.arange(12, dtype=np.float32).reshape(3, 4) / 255)

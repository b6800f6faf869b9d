"""Vendored KITTI split files: presence, counts, format, resolution order.

Reference ships these at `KITTI/splits/**` (SURVEY §2 component #17);
parsing contract "folder frame side" per `KITTI/datasets/mono_dataset.py:179-190`.
"""

import os

import numpy as np
import pytest

from wavelet_monodepth_tpu.data import splits as S


def test_vendored_dir_exists():
    assert os.path.isdir(S.VENDORED_SPLITS_DIR)


@pytest.mark.parametrize("split,counts", sorted(S.SPLIT_COUNTS.items()))
def test_split_counts(split, counts):
    d = S.resolve_split_dir(split)
    for fname, n in counts.items():
        lines = S.readlines(os.path.join(d, fname))
        assert len(lines) == n, (split, fname, len(lines))


def test_line_format_eigen():
    lines = S.read_split("eigen")
    assert len(lines) == 697
    for line in lines[:5] + lines[-5:]:
        parts = line.split()
        assert len(parts) == 3
        folder, frame, side = parts
        assert "/" in folder and side in ("l", "r")
        int(frame)


def test_eigen_to_benchmark_ids():
    path = os.path.join(S.VENDORED_SPLITS_DIR, "benchmark",
                        "eigen_to_benchmark_ids.npy")
    ids = np.load(path)
    assert ids.shape == (652,)


def test_resolution_order(tmp_path, monkeypatch):
    # data_path/splits wins over vendored; env wins over both
    dp = tmp_path / "data"
    (dp / "splits" / "eigen").mkdir(parents=True)
    assert S.resolve_split_dir("eigen", str(dp)) == \
        str(dp / "splits" / "eigen")

    env = tmp_path / "env_splits"
    (env / "eigen").mkdir(parents=True)
    monkeypatch.setenv("WMD_SPLITS_DIR", str(env))
    assert S.resolve_split_dir("eigen", str(dp)) == str(env / "eigen")

    monkeypatch.delenv("WMD_SPLITS_DIR")
    assert S.resolve_split_dir("eigen") == \
        os.path.join(S.VENDORED_SPLITS_DIR, "eigen")

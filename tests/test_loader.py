"""Parallel host loader (data/loader.py): worker-count invariance of
the batch stream (the determinism contract the torch DataLoader does
NOT give), epoch bounding, and error propagation."""

import numpy as np
import pytest
from PIL import Image

from wavelet_monodepth_tpu.data.loader import parallel_batches

DRIVE = "2011_09_26/2011_09_26_drive_0002_sync"


@pytest.fixture(scope="module")
def mini_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_loader")
    rng = np.random.RandomState(7)
    for side in (2, 3):
        d = root / DRIVE / f"image_0{side}" / "data"
        d.mkdir(parents=True)
        for f in range(6):
            arr = rng.randint(0, 255, (64, 128, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{f:010d}.jpg")
    return str(root)


def _dataset(mini_tree):
    from wavelet_monodepth_tpu.data.kitti import KittiRawDataset
    files = [f"{DRIVE} {f} l" for f in range(6)]
    return KittiRawDataset(mini_tree, files, 32, 64, [0, "s"],
                           target_scales=[0, 1], is_train=True)


def _take(it, n):
    return [next(it) for _ in range(n)]


def test_worker_count_does_not_change_the_stream(mini_tree):
    """Augmentation draws are keyed per (seed, epoch, index), so 0- and
    4-worker runs must produce bit-identical batches."""
    a = _take(parallel_batches(_dataset(mini_tree), 2, num_workers=0,
                               seed=3), 5)
    b = _take(parallel_batches(_dataset(mini_tree), 2, num_workers=4,
                               seed=3), 5)
    for ba, bb in zip(a, b):
        assert set(ba) == set(bb)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])


def test_epochs_bound_and_drop_last(mini_tree):
    ds = _dataset(mini_tree)
    batches = list(parallel_batches(ds, 4, num_workers=2, epochs=2,
                                    shuffle=False))
    # 6 items, batch 4, drop_last: 1 batch per epoch x 2 epochs
    assert len(batches) == 2
    assert batches[0][("color", "0", 0)].shape == (4, 32, 64, 3)


def test_loader_raises_on_bad_item(mini_tree):
    ds = _dataset(mini_tree)
    ds.filenames[2] = f"{DRIVE} 99 l"     # missing frame
    with pytest.raises(FileNotFoundError):
        list(parallel_batches(ds, 2, num_workers=2, epochs=1,
                              shuffle=False))


def test_zero_batch_stream_raises():
    """A dataset smaller than batch_size with drop_last used to make
    the epochs=None stream spin forever yielding nothing (hanging the
    train CLIs on a too-small val split) — now a loud ValueError from
    every loader."""
    import pytest
    from wavelet_monodepth_tpu.data import kitti as kitti_data
    from wavelet_monodepth_tpu.data import nyu as nyu_data
    from wavelet_monodepth_tpu.data.loader import parallel_batches

    class OneItem:
        def __len__(self):
            return 1

        def item(self, i, rng=None):
            return {"x": np.zeros(3, np.float32)}

        __getitem__ = item

    for it in (parallel_batches(OneItem(), 2, num_workers=0),
               parallel_batches(OneItem(), 2, num_workers=2),
               kitti_data.batch_iterator(OneItem(), 2),
               nyu_data.batch_iterator(OneItem(), 2)):
        with pytest.raises(ValueError, match="no batch can ever"):
            next(it)

"""NYUv2 host-side input pipeline (NHWC numpy).

Rebuild of `NYUv2/data.py`: whole-zip-in-RAM loading with the csv file
list shuffled at seed 0 (`:71-85`), train augmentations (50% horizontal
flip, channel swap p=0.1, gamma in (1/0.8, 0.8) -> i.e. uniform in
(1.25, 0.8), `:22-68,205-214`), and the ToTensor geometry: 16-px border
crop, image resized to 640x480 (or 224x224), depth to 320x240, train
depth x1000 clamp [10, 1000] (centimetres), test depth /1000
(`:107-140`). Note the reference's train/"test" loaders both draw from
nyu2_train (`:216-223`); we keep that behavior but also expose the real
test list when present.
"""

from __future__ import annotations

import random
from io import BytesIO
from itertools import permutations
from zipfile import ZipFile

import numpy as np
from PIL import Image

_PERMS = list(permutations(range(3), 3))


def load_zip_to_mem(zip_file: str, list_name: str = "data/nyu2_train.csv"):
    """-> (bytes dict, shuffled (image, depth) path pairs)."""
    zf = ZipFile(zip_file)
    data = {name: zf.read(name) for name in zf.namelist()}
    rows = [r.split(",") for r in
            data[list_name].decode("utf-8").split("\n") if len(r) > 0]
    try:
        from sklearn.utils import shuffle
        rows = shuffle(rows, random_state=0)
    except ImportError:
        rng = np.random.RandomState(0)
        rows = [rows[i] for i in rng.permutation(len(rows))]
    return data, rows


def _to_float(img: Image.Image) -> np.ndarray:
    arr = np.asarray(img, np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr / 255.0


def _depth_to_float(img: Image.Image) -> np.ndarray:
    """The reference's `to_tensor` semantics for depth maps
    (`data.py:142-173`): byte images divide by 255, integer-mode PILs
    ('I' int32, 'I;16' 16-bit) keep their RAW values — NYU 16-bit depth
    PNGs carry millimetres and must not be squashed by /255."""
    arr = np.asarray(img, np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    if getattr(img, "mode", None) in ("I", "I;16"):
        return arr
    return arr / 255.0


class NyuDepthDataset:
    """`depthDatasetMemory` + transform pipeline in one class."""

    def __init__(self, data: dict, pairs, is_train: bool = True,
                 is_test: bool = False, is_224: bool = False,
                 gamma: float = 0.8, channel_swap_p: float = 0.1,
                 seed: int = 0, uint8_feed: bool = False):
        """`uint8_feed=True` ships post-resize uint8 arrays and leaves
        the float cast + centimetre clamp to the device (the jitted step
        calls ops/augment.expand_nyu) — 4x fewer host->device bytes and
        no host float conversion, bit-identical to the float feed (all
        augmentations already run on uint8 pixels; the reference also
        converts to float only after crop/resize, `data.py:107-140`).
        Test-transform items (is_test) and non-8-bit depth maps fall
        back to the float path per array."""
        self.data = data
        self.pairs = pairs
        self.is_train = is_train
        self.is_test = is_test
        self.is_224 = is_224
        self.gamma = gamma
        self.channel_swap_p = channel_swap_p
        self.rng = random.Random(seed)
        self.uint8_feed = uint8_feed

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, idx: int) -> dict:
        return self.item(idx)

    def item(self, idx: int, rng=None) -> dict:
        """Assemble one item; `rng` keys the augmentation draws (see
        data/loader.py), defaulting to the shared sequential RNG."""
        rng = rng if rng is not None else self.rng
        img_name, depth_name = self.pairs[idx][0], self.pairs[idx][1]
        image = Image.open(BytesIO(self.data[img_name])).convert("RGB")
        depth = Image.open(BytesIO(self.data[depth_name]))

        if self.is_train:
            if rng.random() < 0.5:
                image = image.transpose(Image.FLIP_LEFT_RIGHT)
                depth = depth.transpose(Image.FLIP_LEFT_RIGHT)
            if rng.random() < self.channel_swap_p:
                arr = np.asarray(image)
                perm = _PERMS[rng.randint(0, len(_PERMS) - 1)]
                image = Image.fromarray(arr[..., list(perm)])
            if self.gamma:
                g = rng.uniform(1.0 / self.gamma, self.gamma)
                # the reference's float-pow-per-pixel (`data.py:205-214`)
                # is pointwise on uint8 values, so a 256-entry LUT is
                # bit-identical and ~30x cheaper on the host
                lut = (255.0 * np.power(
                    np.arange(256, dtype=np.float32) / 255.0,
                    np.float32(g))).astype(np.uint8)
                image = Image.fromarray(lut[np.asarray(image)])

        crop = 16
        image = image.crop((crop, crop, 640 - crop, 480 - crop))
        depth = depth.crop((crop, crop, 640 - crop, 480 - crop))
        if self.is_224:
            image = image.resize((224, 224))
            depth = depth.resize((224, 224))
        else:
            image = image.resize((640, 480))
            depth = depth.resize((320, 240))

        if self.uint8_feed and not self.is_test:
            image_arr = np.asarray(image, np.uint8)
            d = np.asarray(depth)
            if d.dtype == np.uint8:
                depth_arr = d[..., None] if d.ndim == 2 else d
            else:   # 16-bit depth png: raw ints x1000, clamp on host
                depth_arr = np.clip(_depth_to_float(depth) * 1000.0,
                                    10.0, 1000.0)
            return {"image": image_arr, "depth": depth_arr}
        image_arr = _to_float(image)
        depth_arr = _depth_to_float(depth)
        # `ToTensor.__call__` (`data.py:132-139`): /1000 for is_test,
        # x1000 otherwise, and the [10, 1000] clamp applies to BOTH
        # branches ([0.1m, 10m] in cm)
        if self.is_test:
            depth_arr = depth_arr / 1000.0
        else:
            depth_arr = depth_arr * 1000.0
        return {"image": image_arr,
                "depth": np.clip(depth_arr, 10.0, 1000.0)}


def get_training_testing_data(zip_path: str, is_224: bool = False,
                              seed: int = 0, uint8_feed: bool = False):
    """`getTrainingTestingData` (`data.py:216-223`) minus the DataLoader:
    returns (train_dataset, test_dataset) over the same nyu2_train list,
    matching the reference."""
    data, pairs = load_zip_to_mem(zip_path)
    train = NyuDepthDataset(data, pairs, is_train=True, is_224=is_224,
                            seed=seed, uint8_feed=uint8_feed)
    test = NyuDepthDataset(data, pairs, is_train=False, is_224=is_224,
                           seed=seed, uint8_feed=uint8_feed)
    return train, test


def batch_iterator(dataset, batch_size: int, shuffle: bool = True,
                   drop_last: bool = True, seed: int = 0, epochs=None):
    if drop_last and len(dataset) < batch_size:
        raise ValueError(
            f"dataset has {len(dataset)} items < batch_size={batch_size} "
            f"with drop_last: no batch can ever be yielded")
    order = np.arange(len(dataset))
    rng = np.random.RandomState(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        if shuffle:
            rng.shuffle(order)
        for start in range(0, len(order), batch_size):
            idx = order[start:start + batch_size]
            if len(idx) < batch_size and drop_last:
                continue
            items = [dataset[int(i)] for i in idx]
            yield {k: np.stack([it[k] for it in items])
                   for k in items[0]}
        epoch += 1

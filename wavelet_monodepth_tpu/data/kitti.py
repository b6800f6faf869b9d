"""KITTI host-side input pipeline (NHWC numpy, feeding jax.device_put).

Rebuild of `KITTI/datasets/mono_dataset.py:44-350` and
`KITTI/datasets/kitti_dataset.py:18-118`: split-file parsing
("folder frame side"), multi-scale resize pyramid, shared-across-frames
color jitter, 50% horizontal flip, per-scale normalized intrinsics,
stereo extrinsics with the ±0.1 nominal baseline, and per-frame depth
hints with a zero-mask fallback when the .npy is missing.

Returns dicts with the tuple-key contract used by the jitted train step
(frame ids stringified — see train/losses_kitti.py):
  ("color", fid, s), ("color_aug", fid, s): float32 (H/2^s, W/2^s, 3)
  ("K", s), ("inv_K", s): (4, 4)
  ("stereo_T",), ("depth_hint",), ("depth_hint_mask",): stereo extras
"""

from __future__ import annotations

import os
import random
from typing import Optional, Sequence

import numpy as np
from PIL import Image, ImageEnhance


MIN_DEPTH = 0.1
MAX_DEPTH = 100.0

# normalized intrinsics (`kitti_dataset.py:24-28`)
K_NORM = np.array([[0.58, 0, 0.5, 0],
                   [0, 1.92, 0.5, 0],
                   [0, 0, 1, 0],
                   [0, 0, 0, 1]], dtype=np.float32)

SIDE_MAP = {"2": 2, "3": 3, "l": 2, "r": 3}
FULL_RES_SHAPE = (1242, 375)


def readlines(path: str) -> list[str]:
    with open(path) as f:
        return f.read().splitlines()


def depth_to_disp_np(depth: np.ndarray, min_depth=MIN_DEPTH,
                     max_depth=MAX_DEPTH) -> np.ndarray:
    min_disp, max_disp = 1.0 / max_depth, 1.0 / min_depth
    disp = 1.0 / (depth + 1e-5)
    disp = (disp - min_disp) / (max_disp - min_disp)
    disp[depth <= 0] = 0
    disp[disp <= 0] = 0
    return disp


def _jitter_params(rng: random.Random):
    """Brightness/contrast/saturation in (0.8, 1.2), hue in (-0.1, 0.1)
    (`mono_dataset.py:98-104`), applied identically to all frames of one
    item."""
    return dict(brightness=rng.uniform(0.8, 1.2),
                contrast=rng.uniform(0.8, 1.2),
                saturation=rng.uniform(0.8, 1.2),
                hue=rng.uniform(-0.1, 0.1))


def _apply_jitter(img: Image.Image, p: dict) -> Image.Image:
    img = ImageEnhance.Brightness(img).enhance(p["brightness"])
    img = ImageEnhance.Contrast(img).enhance(p["contrast"])
    img = ImageEnhance.Color(img).enhance(p["saturation"])
    if abs(p["hue"]) > 1e-6:
        hsv = np.array(img.convert("HSV"), dtype=np.int16)
        hsv[..., 0] = (hsv[..., 0] + int(p["hue"] * 255)) % 256
        img = Image.fromarray(hsv.astype(np.uint8),
                              "HSV").convert("RGB")
    return img


class KittiRawDataset:
    """`KITTIRAWDataset` equivalent; `dataset='odom'` switches the path
    scheme (`kitti_dataset.py:72-85`)."""

    def __init__(self, data_path: str, filenames: Sequence[str],
                 height: int, width: int, frame_idxs: Sequence,
                 target_scales: Sequence[int] = (0, 1, 2, 3),
                 is_train: bool = False, img_ext: str = ".jpg",
                 use_depth_hints: bool = False,
                 depth_hint_path: Optional[str] = None,
                 dataset: str = "kitti", seed: int = 0,
                 aug_scales: Optional[Sequence[int]] = None,
                 other_frame_scales: Optional[Sequence[int]] = None,
                 device_augment: bool = False):
        """`aug_scales` / `other_frame_scales` trim the item to what the
        consumer reads: the train step encodes only scale-0 color_aug
        and (without --v1_multiscale) samples non-center frames only at
        scale 0 (`trainer.py:231-252,329-392`), so the CLIs pass (0,)
        for both — the reference builds (and its trainer ignores) the
        full pyramid for every frame. None keeps the reference-shaped
        item. `device_augment=True` emits uint8 ("color_u8", fid, s)
        frames plus a ("jitter",) param vector instead of float colors
        and host-jittered color_aug; the jitted step casts and jitters
        on device (ops/augment.expand_batch) — 4x fewer host->device
        bytes and no host jitter/float-conversion cost."""
        self.data_path = data_path
        self.filenames = list(filenames)
        self.height = height
        self.width = width
        self.frame_idxs = list(frame_idxs)
        self.target_scales = list(target_scales)
        self.is_train = is_train
        self.img_ext = img_ext
        self.use_depth_hints = use_depth_hints
        self.depth_hint_path = (depth_hint_path or
                                os.path.join(data_path, "depth_hints"))
        self.dataset = dataset
        self.rng = random.Random(seed)
        self.aug_scales = (list(target_scales) if aug_scales is None
                           else list(aug_scales))
        self.other_frame_scales = (
            list(target_scales) if other_frame_scales is None
            else list(other_frame_scales))
        self.device_augment = device_augment

    def __len__(self):
        return len(self.filenames)

    # -- path schemes ---------------------------------------------------
    def get_image_path(self, folder: str, frame_index: int,
                       side: str) -> str:
        if self.dataset == "kitti_odom":
            return os.path.join(
                self.data_path, f"sequences/{int(folder):02d}",
                f"image_{SIDE_MAP[side]}",
                f"{frame_index:06d}{self.img_ext}")
        return os.path.join(self.data_path, folder,
                            f"image_0{SIDE_MAP[side]}/data",
                            f"{frame_index:010d}{self.img_ext}")

    def get_color(self, folder, frame_index, side, do_flip) -> Image.Image:
        with open(self.get_image_path(folder, frame_index, side),
                  "rb") as f:
            img = Image.open(f).convert("RGB")
        if do_flip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        return img

    def get_depth(self, folder, frame_index, side, do_flip) -> np.ndarray:
        """GT depth at the full-res shape: velodyne projection for the
        raw dataset (`kitti_dataset.py:54-69`), improved-GT 16-bit pngs
        /256 for dataset='kitti_depth' (`kitti_dataset.py:103-118`)."""
        import cv2
        if self.dataset == "kitti_depth":
            depth_path = os.path.join(
                self.data_path, folder,
                f"proj_depth/groundtruth/image_0{SIDE_MAP[side]}",
                f"{int(frame_index):010d}.png")
            depth = np.asarray(Image.open(depth_path).resize(
                FULL_RES_SHAPE, Image.NEAREST), np.float32) / 256.0
        else:
            from .kitti_utils import generate_depth_map
            calib_path = os.path.join(self.data_path,
                                      folder.split("/")[0])
            velo = os.path.join(
                self.data_path, folder,
                f"velodyne_points/data/{int(frame_index):010d}.bin")
            depth = generate_depth_map(calib_path, velo, SIDE_MAP[side])
            depth = cv2.resize(depth, FULL_RES_SHAPE,
                               interpolation=cv2.INTER_NEAREST)
        if do_flip:
            depth = np.fliplr(depth)
        return depth

    # -- item assembly --------------------------------------------------
    def __getitem__(self, index: int) -> dict:
        return self.item(index)

    def item(self, index: int, rng: Optional[random.Random] = None) -> dict:
        """Assemble one item. `rng` keys this item's augmentation draws
        (parallel loaders pass a per-(seed, epoch, index) Random so the
        stream is independent of worker scheduling, data/loader.py);
        default is the dataset's shared sequential RNG."""
        rng = rng if rng is not None else self.rng
        inputs: dict = {}
        do_aug = self.is_train and rng.random() > 0.5
        do_flip = self.is_train and rng.random() > 0.5

        line = self.filenames[index].split()
        folder = line[0]
        frame_index = int(line[1]) if len(line) == 3 else 0
        side = line[2] if len(line) == 3 else None

        raw: dict = {}
        for i in self.frame_idxs:
            if i == "s":
                other = {"r": "l", "l": "r"}[side]
                raw[i] = self.get_color(folder, frame_index, other, do_flip)
            else:
                raw[i] = self.get_color(folder, frame_index + i, side,
                                        do_flip)

        jit = _jitter_params(rng) if do_aug else None
        for i, img in raw.items():
            frame_scales = (self.target_scales if str(i) == "0"
                            else self.other_frame_scales)
            prev = img
            for s in self.target_scales:
                if s > max(frame_scales):
                    break                      # chain ends; rest unread
                w, h = self.width // 2 ** s, self.height // 2 ** s
                prev = prev.resize((w, h), Image.LANCZOS)
                if s not in frame_scales:
                    continue                   # chain passes through
                if self.device_augment:
                    inputs[("color_u8", str(i), s)] = np.asarray(
                        prev, np.uint8)
                    continue
                arr = np.asarray(prev, np.float32) / 255.0
                inputs[("color", str(i), s)] = arr
                if s in self.aug_scales:
                    aug = _apply_jitter(prev, jit) if jit else prev
                    inputs[("color_aug", str(i), s)] = (
                        np.asarray(aug, np.float32) / 255.0)
        if self.device_augment:
            inputs[("jitter",)] = np.asarray(
                [jit["brightness"], jit["contrast"], jit["saturation"],
                 jit["hue"]] if jit else [1.0, 1.0, 1.0, 0.0],
                np.float32)

        for s in self.target_scales:
            K = K_NORM.copy()
            K[0, :] *= self.width // 2 ** s
            K[1, :] *= self.height // 2 ** s
            inputs[("K", s)] = K
            inputs[("inv_K", s)] = np.linalg.pinv(K).astype(np.float32)

        if "s" in self.frame_idxs:
            stereo_T = np.eye(4, dtype=np.float32)
            baseline_sign = -1 if do_flip else 1
            side_sign = -1 if side == "l" else 1
            stereo_T[0, 3] = side_sign * baseline_sign * 0.1
            inputs[("stereo_T",)] = stereo_T

            if self.use_depth_hints:
                import cv2
                side_folder = "image_02" if side == "l" else "image_03"
                hint_file = os.path.join(
                    self.depth_hint_path, folder, side_folder,
                    str(frame_index).zfill(10) + ".npy")
                try:
                    depth = np.load(hint_file)[0]
                    if do_flip:
                        depth = np.fliplr(depth)
                    depth = cv2.resize(depth, (self.width, self.height),
                                       interpolation=cv2.INTER_NEAREST)
                    inputs[("depth_hint",)] = depth.astype(
                        np.float32)[..., None]
                    inputs[("depth_hint_mask",)] = (
                        depth > 0).astype(np.float32)[..., None]
                    inputs[("disp_hint",)] = depth_to_disp_np(
                        depth.astype(np.float32))[..., None]
                except FileNotFoundError:
                    # zero-mask fallback (the hint loss sees no valid
                    # pixels; the reference adds NO keys and crashes
                    # torch's collate on partially precomputed hint
                    # dirs). Must emit the SAME key set as the found
                    # branch or our collation goes jagged mid-epoch.
                    z = np.zeros((self.height, self.width, 1), np.float32)
                    inputs[("depth_hint",)] = z
                    inputs[("depth_hint_mask",)] = z
                    inputs[("disp_hint",)] = z
        return inputs


def batch_iterator(dataset, batch_size: int, shuffle: bool = True,
                   drop_last: bool = True, seed: int = 0):
    """Minimal host-side loader: collates items into batched NHWC arrays.
    (The reference's DataLoader worker pool is process-parallel JPEG
    decode; on TPU hosts this is typically overlapped with device steps —
    use tools/prefetch.to_device for double buffering.)"""
    if drop_last and len(dataset) < batch_size:
        raise ValueError(
            f"dataset has {len(dataset)} items < batch_size={batch_size} "
            f"with drop_last: no batch can ever be yielded")
    order = np.arange(len(dataset))
    rng = np.random.RandomState(seed)
    while True:
        if shuffle:
            rng.shuffle(order)
        for start in range(0, len(order), batch_size):
            idx = order[start:start + batch_size]
            if len(idx) < batch_size and drop_last:
                continue
            items = [dataset[int(i)] for i in idx]
            batch = {k: np.stack([it[k] for it in items])
                     for k in items[0]}
            yield batch
        if not shuffle:
            return

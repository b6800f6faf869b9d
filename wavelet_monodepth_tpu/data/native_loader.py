"""ctypes bindings for the native host-side runtime (native/wmd_native.cpp).

Provides the C++ equivalents of the reference's external-native host
work: multithreaded image decode+resize (pillow-SIMD + DataLoader
workers in the reference), velodyne->depth projection, and a CPU Haar
reference. Falls back gracefully when the library hasn't been built
(`native/build.sh`).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "libwmd_native.so")
_lib = None


def load_library(path: Optional[str] = None):
    global _lib
    if _lib is not None:
        return _lib
    p = path or _LIB_PATH
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"{p} not built — run native/build.sh")
    lib = ctypes.CDLL(p)
    lib.wmd_decode_resize_batch.restype = ctypes.c_int
    lib.wmd_decode_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.wmd_decode_resize_batch_u8.restype = ctypes.c_int
    lib.wmd_decode_resize_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
    lib.wmd_velodyne_to_depth.restype = None
    lib.wmd_velodyne_to_depth.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.wmd_haar_dwt2.restype = None
    lib.wmd_haar_idwt2.restype = None
    _lib = lib
    return lib


def available() -> bool:
    try:
        load_library()
        return True
    except (FileNotFoundError, OSError):
        return False


def decode_resize_batch(paths: Sequence[str], height: int, width: int,
                        flips: Optional[Sequence[bool]] = None,
                        num_threads: int = 4) -> np.ndarray:
    """Decode + Lanczos-resize a batch of images to float32 NHWC [0,1]."""
    lib = load_library()
    n = len(paths)
    out = np.empty((n, height, width, 3), np.float32)
    c_paths = (ctypes.c_char_p * n)(
        *[p.encode() for p in paths])
    flips_arr = np.asarray(
        [1 if (flips is not None and flips[i]) else 0 for i in range(n)],
        np.int32)
    rc = lib.wmd_decode_resize_batch(
        c_paths, n, height, width,
        flips_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads)
    if rc != 0:
        raise IOError(f"failed to load image: {paths[rc - 1]}")
    return out


def decode_resize_batch_u8(paths: Sequence[str], height: int,
                           width: int,
                           flips: Optional[Sequence[bool]] = None,
                           num_threads: int = 4) -> np.ndarray:
    """Decode + Lanczos-resize to uint8 NHWC [0,255] — the uint8 eval
    feed (the float variant equals this * 1/255 exactly; the device
    casts instead, shipping 4x fewer bytes)."""
    lib = load_library()
    n = len(paths)
    out = np.empty((n, height, width, 3), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    flips_arr = np.asarray(
        [1 if (flips is not None and flips[i]) else 0 for i in range(n)],
        np.int32)
    rc = lib.wmd_decode_resize_batch_u8(
        c_paths, n, height, width,
        flips_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), num_threads)
    if rc != 0:
        raise IOError(f"failed to load image: {paths[rc - 1]}")
    return out


def build_pyramid(img: np.ndarray, levels: int) -> list[np.ndarray]:
    """Chained half-scale Lanczos pyramid of a float32 (H, W, 3) image
    (the multi-scale resize of `mono_dataset.py:111-116`, natively)."""
    lib = load_library()
    h, w = img.shape[:2]
    img = np.ascontiguousarray(img, np.float32)
    outs = []
    ptrs = (ctypes.POINTER(ctypes.c_float) * levels)()
    for level in range(levels):
        h, w = h // 2, w // 2
        a = np.empty((h, w, 3), np.float32)
        outs.append(a)
        ptrs[level] = a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lib.wmd_build_pyramid(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img.shape[0], img.shape[1], levels, ptrs)
    return outs


def velodyne_to_depth(points: np.ndarray, P_velo2im: np.ndarray,
                      im_shape: tuple[int, int]) -> np.ndarray:
    """points (N, 4) float32, P (3, 4) -> depth (H, W) float32."""
    lib = load_library()
    pts = np.ascontiguousarray(points, np.float32)
    P = np.ascontiguousarray(P_velo2im, np.float64)
    h, w = im_shape
    depth = np.empty((h, w), np.float32)
    lib.wmd_velodyne_to_depth(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts),
        P.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), h, w,
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return depth


def haar_dwt2(x: np.ndarray):
    lib = load_library()
    h, w = x.shape
    x = np.ascontiguousarray(x, np.float32)
    bands = [np.empty((h // 2, w // 2), np.float32) for _ in range(4)]
    ptr = ctypes.POINTER(ctypes.c_float)
    lib.wmd_haar_dwt2(x.ctypes.data_as(ptr), h, w,
                      *[b.ctypes.data_as(ptr) for b in bands])
    return tuple(bands)


def haar_idwt2(ll, lh, hl, hh):
    lib = load_library()
    oh, ow = ll.shape
    out = np.empty((oh * 2, ow * 2), np.float32)
    ptr = ctypes.POINTER(ctypes.c_float)
    args = [np.ascontiguousarray(a, np.float32) for a in (ll, lh, hl, hh)]
    lib.wmd_haar_idwt2(*[a.ctypes.data_as(ptr) for a in args], oh, ow,
                       out.ctypes.data_as(ptr))
    return out

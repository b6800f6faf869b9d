"""KITTI calibration / velodyne ground-truth utilities (host-side numpy).

Rebuild of `KITTI/kitti_utils.py:14-104`: raw calib parsing, velodyne
point loading, and the velodyne->camera projection that produces sparse
GT depth maps (duplicate pixels resolved to the minimum depth, matching
the KITTI devkit convention the reference follows).
"""

from __future__ import annotations

import os

import numpy as np


def load_velodyne_points(filename: str) -> np.ndarray:
    pts = np.fromfile(filename, dtype=np.float32).reshape(-1, 4)
    pts[:, 3] = 1.0
    return pts


def read_calib_file(path: str) -> dict:
    data = {}
    with open(path) as f:
        for line in f:
            key, value = line.split(":", 1)
            value = value.strip()
            try:
                data[key] = np.array([float(x) for x in value.split()])
            except ValueError:
                data[key] = value
    return data


def generate_depth_map(calib_dir: str, velo_filename: str, cam: int = 2,
                       vel_depth: bool = False) -> np.ndarray:
    """Sparse depth map in the rectified cam-`cam` frame."""
    cam2cam = read_calib_file(os.path.join(calib_dir,
                                           "calib_cam_to_cam.txt"))
    velo2cam_raw = read_calib_file(os.path.join(calib_dir,
                                                "calib_velo_to_cam.txt"))
    velo2cam = np.eye(4)
    velo2cam[:3, :3] = velo2cam_raw["R"].reshape(3, 3)
    velo2cam[:3, 3] = velo2cam_raw["T"]

    im_shape = cam2cam["S_rect_02"][::-1].astype(np.int32)

    R_rect = np.eye(4)
    R_rect[:3, :3] = cam2cam["R_rect_00"].reshape(3, 3)
    P_rect = cam2cam[f"P_rect_0{cam}"].reshape(3, 4)
    P_velo2im = P_rect @ R_rect @ velo2cam

    velo = load_velodyne_points(velo_filename)
    velo = velo[velo[:, 0] >= 0]

    pts_im = (P_velo2im @ velo.T).T
    pts_im[:, :2] /= pts_im[:, 2:3]
    if vel_depth:
        pts_im[:, 2] = velo[:, 0]

    # round-minus-one matches the KITTI matlab devkit indexing
    pts_im[:, 0] = np.round(pts_im[:, 0]) - 1
    pts_im[:, 1] = np.round(pts_im[:, 1]) - 1
    valid = ((pts_im[:, 0] >= 0) & (pts_im[:, 1] >= 0)
             & (pts_im[:, 0] < im_shape[1]) & (pts_im[:, 1] < im_shape[0]))
    pts_im = pts_im[valid]

    depth = np.zeros(tuple(im_shape[:2]), dtype=np.float64)
    ys = pts_im[:, 1].astype(np.int64)
    xs = pts_im[:, 0].astype(np.int64)
    # scatter with min-depth resolution for duplicate pixels: sort by
    # descending depth so the smallest depth lands last (vectorized
    # version of the reference's Counter loop)
    order = np.argsort(-pts_im[:, 2])
    depth[ys[order], xs[order]] = pts_im[order, 2]
    depth[depth < 0] = 0
    return depth

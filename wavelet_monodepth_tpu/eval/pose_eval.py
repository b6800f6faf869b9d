"""KITTI odometry evaluation: 5-frame-track ATE.

Rebuild of `KITTI/evaluate_pose.py:23-134` (which follows SfMLearner's
protocol): predict pairwise relative poses over odom sequence 09/10,
chain them into short tracks, align scale to the GT track, report RMSE.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np


def dump_xyz(rel_transforms) -> list[np.ndarray]:
    """Chain source->target transforms into camera positions."""
    xyzs = []
    cam_to_world = np.eye(4)
    xyzs.append(cam_to_world[:3, 3].copy())
    for T in rel_transforms:
        cam_to_world = cam_to_world @ T
        xyzs.append(cam_to_world[:3, 3].copy())
    return xyzs


def compute_ate(gtruth_xyz: np.ndarray, pred_xyz_o: np.ndarray) -> float:
    """Scale-aligned absolute trajectory error over one track."""
    offset = gtruth_xyz[0] - pred_xyz_o[0]
    pred_xyz = pred_xyz_o + offset[None, :]
    scale = np.sum(gtruth_xyz * pred_xyz) / np.sum(pred_xyz ** 2)
    err = pred_xyz * scale - gtruth_xyz
    return float(np.sqrt(np.sum(err ** 2)) / gtruth_xyz.shape[0])


def local_gt_poses(gt_global_poses: np.ndarray) -> list[np.ndarray]:
    """KITTI odometry poses file (N, 3, 4) -> relative local poses
    (`evaluate_pose.py:104-114`)."""
    g = np.concatenate(
        [gt_global_poses, np.zeros((gt_global_poses.shape[0], 1, 4))], 1)
    g[:, 3, 3] = 1
    out = []
    for i in range(1, len(g)):
        out.append(np.linalg.inv(np.linalg.inv(g[i - 1]) @ g[i]))
    return out


def evaluate_trajectory(pred_poses: np.ndarray,
                        gt_global_poses: np.ndarray,
                        track_length: int = 5):
    """-> (mean ATE, std ATE) over all 5-frame tracks."""
    gt_local = local_gt_poses(gt_global_poses)
    gt_xyzs = gt_global_poses[:, :3, 3]
    ates = []
    num_frames = gt_xyzs.shape[0]
    for i in range(num_frames - 1):
        local_xyzs = np.array(dump_xyz(pred_poses[i:i + track_length - 1]))
        gt_local_xyzs = np.array(dump_xyz(gt_local[i:i + track_length - 1]))
        ates.append(compute_ate(gt_local_xyzs, local_xyzs))
    return float(np.mean(ates)), float(np.std(ates))


def predict_poses(pose_forward: Callable,
                  frame_pairs: Iterable[np.ndarray]) -> np.ndarray:
    """Run the pose net over (N, H, W, 6) stacked frame pairs; returns
    (N, 4, 4) relative transforms (`evaluate_pose.py:89-102`)."""
    import jax.numpy as jnp
    from ..ops.geometry import transformation_from_parameters

    preds = []
    for pair in frame_pairs:
        if pair.ndim == 3:
            pair = pair[None]
        aa, tr = pose_forward(jnp.asarray(pair, jnp.float32))
        T = transformation_from_parameters(aa[:, 0], tr[:, 0])
        preds.append(np.asarray(T))
    return np.concatenate(preds, axis=0)

"""Depth/disparity conversions and projective geometry, pure JAX.

TPU-native equivalents of `KITTI/layers.py:16-117,176-230` — stateless
functions instead of stateful nn.Modules holding precomputed pixel grids
(XLA constant-folds the grids under jit, so the caching the reference does
by hand is free here).
"""

from __future__ import annotations

import jax.numpy as jnp


def disp_to_depth(disp: jnp.ndarray, min_depth: float, max_depth: float):
    """Sigmoid output -> (scaled_disp, depth). `KITTI/layers.py:16-25`."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def depth_to_disp(depth: jnp.ndarray, min_depth: float, max_depth: float):
    """Depth map -> normalized disparity. `KITTI/layers.py:28-39`."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    disp = 1.0 / (depth + 1e-5)
    disp = (disp - min_disp) / (max_disp - min_disp)
    disp = jnp.where(depth <= 0, 0.0, disp)
    disp = jnp.where(disp <= 0, 0.0, disp)
    return disp


def rot_from_axisangle(vec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (B, 1, 3) -> 4x4 rotation matrices (B, 4, 4).
    Rodrigues formula, matching `KITTI/layers.py:78-117`."""
    angle = jnp.linalg.norm(vec, axis=2, keepdims=True)          # (B,1,1)
    axis = vec / (angle + 1e-7)
    ca = jnp.cos(angle)[:, 0, 0]
    sa = jnp.sin(angle)[:, 0, 0]
    C = 1.0 - ca
    x, y, z = axis[:, 0, 0], axis[:, 0, 1], axis[:, 0, 2]
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC
    b = vec.shape[0]
    rot = jnp.zeros((b, 4, 4), dtype=vec.dtype)
    rot = rot.at[:, 0, 0].set(x * xC + ca)
    rot = rot.at[:, 0, 1].set(xyC - zs)
    rot = rot.at[:, 0, 2].set(zxC + ys)
    rot = rot.at[:, 1, 0].set(xyC + zs)
    rot = rot.at[:, 1, 1].set(y * yC + ca)
    rot = rot.at[:, 1, 2].set(yzC - xs)
    rot = rot.at[:, 2, 0].set(zxC - ys)
    rot = rot.at[:, 2, 1].set(yzC + xs)
    rot = rot.at[:, 2, 2].set(z * zC + ca)
    rot = rot.at[:, 3, 3].set(1.0)
    return rot


def get_translation_matrix(t: jnp.ndarray) -> jnp.ndarray:
    """Translation (B, 3) or (B, 1, 3) -> 4x4. `KITTI/layers.py:62-75`."""
    t = t.reshape(-1, 3)
    b = t.shape[0]
    T = jnp.tile(jnp.eye(4, dtype=t.dtype)[None], (b, 1, 1))
    return T.at[:, :3, 3].set(t)


def transformation_from_parameters(axisangle: jnp.ndarray,
                                   translation: jnp.ndarray,
                                   invert: bool = False) -> jnp.ndarray:
    """(axisangle, translation) -> 4x4 pose. `KITTI/layers.py:42-59`.
    axisangle/translation: (B, 1, 3)."""
    R = rot_from_axisangle(axisangle)
    t = translation
    if invert:
        R = jnp.swapaxes(R, 1, 2)
        t = -t
    T = get_translation_matrix(t)
    return jnp.matmul(R, T) if invert else jnp.matmul(T, R)


def backproject_depth(depth: jnp.ndarray, inv_K: jnp.ndarray) -> jnp.ndarray:
    """Depth image -> homogeneous cam points.

    Args:
      depth: (N, H, W, 1); inv_K: (N, 4, 4).
    Returns:
      (N, 4, H*W) points. `KITTI/layers.py:176-205`.
    """
    n, h, w, _ = depth.shape
    xs = jnp.arange(w, dtype=depth.dtype)
    ys = jnp.arange(h, dtype=depth.dtype)
    gx, gy = jnp.meshgrid(xs, ys)                 # (H, W), xy indexing
    pix = jnp.stack([gx.reshape(-1), gy.reshape(-1),
                     jnp.ones(h * w, dtype=depth.dtype)], axis=0)  # (3,HW)
    pix = jnp.broadcast_to(pix[None], (n, 3, h * w))
    cam = jnp.matmul(inv_K[:, :3, :3], pix)
    cam = depth.reshape(n, 1, h * w) * cam
    ones = jnp.ones((n, 1, h * w), dtype=depth.dtype)
    return jnp.concatenate([cam, ones], axis=1)


def project_3d(points: jnp.ndarray, K: jnp.ndarray, T: jnp.ndarray,
               height: int, width: int, eps: float = 1e-7) -> jnp.ndarray:
    """Cam points -> normalized sample grid (N, H, W, 2) in [-1, 1], last
    dim (x, y) — feed to ops.image.grid_sample_border.
    `KITTI/layers.py:208-230`."""
    n = points.shape[0]
    P = jnp.matmul(K, T)[:, :3, :]
    cam = jnp.matmul(P, points)                   # (N, 3, HW)
    pix = cam[:, :2, :] / (cam[:, 2:3, :] + eps)
    pix = pix.reshape(n, 2, height, width).transpose(0, 2, 3, 1)
    sx = pix[..., 0] / (width - 1)
    sy = pix[..., 1] / (height - 1)
    return jnp.stack([(sx - 0.5) * 2.0, (sy - 0.5) * 2.0], axis=-1)

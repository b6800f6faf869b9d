"""Depth error metrics (KITTI 7-metric table and NYU variants).

numpy implementations for evaluators (`KITTI/evaluate_depth.py:50-68`,
`NYUv2/utils.py:85-98`) plus jnp twins for in-training validation
(`KITTI/layers.py:314-332`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def compute_errors_np(gt: np.ndarray, pred: np.ndarray):
    """KITTI metrics over flattened valid pixels.
    Returns (abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3)."""
    thresh = np.maximum(gt / pred, pred / gt)
    a1 = (thresh < 1.25).mean()
    a2 = (thresh < 1.25 ** 2).mean()
    a3 = (thresh < 1.25 ** 3).mean()
    rmse = np.sqrt(((gt - pred) ** 2).mean())
    rmse_log = np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean())
    abs_rel = np.mean(np.abs(gt - pred) / gt)
    sq_rel = np.mean(((gt - pred) ** 2) / gt)
    return abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3


def compute_errors_jnp(gt: jnp.ndarray, pred: jnp.ndarray):
    thresh = jnp.maximum(gt / pred, pred / gt)
    a1 = (thresh < 1.25).mean()
    a2 = (thresh < 1.25 ** 2).mean()
    a3 = (thresh < 1.25 ** 3).mean()
    rmse = jnp.sqrt(((gt - pred) ** 2).mean())
    rmse_log = jnp.sqrt(((jnp.log(gt) - jnp.log(pred)) ** 2).mean())
    abs_rel = jnp.mean(jnp.abs(gt - pred) / gt)
    sq_rel = jnp.mean(((gt - pred) ** 2) / gt)
    return abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3


def compute_errors_nyu_np(gt: np.ndarray, pred: np.ndarray):
    """NYU metrics (`NYUv2/utils.py:85-98`):
    (a1, a2, a3, abs_rel, rmse, log10)."""
    thresh = np.maximum(gt / pred, pred / gt)
    a1 = (thresh < 1.25).mean()
    a2 = (thresh < 1.25 ** 2).mean()
    a3 = (thresh < 1.25 ** 3).mean()
    abs_rel = np.mean(np.abs(gt - pred) / gt)
    rmse = np.sqrt(((gt - pred) ** 2).mean())
    log10 = np.mean(np.abs(np.log10(gt) - np.log10(pred)))
    return a1, a2, a3, abs_rel, rmse, log10

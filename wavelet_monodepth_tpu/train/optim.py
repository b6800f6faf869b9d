"""Optimizer construction: Adam + StepLR, with the reference's
weight-decay grouping.

The reference uses torch Adam(weight_decay=1e-5) with `group_weight`
param groups (`trainer.py:96-101`, `pyt_utils.py:12-29`): encoder params
all decay; decoder conv *kernels* decay, conv *biases* do not. torch's
Adam adds wd*p to the gradient before the moment update, so the optax
chain places add_decayed_weights before scale_by_adam.

StepLR(step_size=15, gamma=0.1) is stepped at epoch *start*
(`trainer.py:197`), so with torch semantics the k-th epoch (0-based) runs
at lr0 * 0.1^((k+1)//15).
"""

from __future__ import annotations

from typing import Any

import jax
import optax


def steplr_schedule(base_lr: float, steps_per_epoch: int,
                    step_size: int = 15, gamma: float = 0.1):
    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        return base_lr * gamma ** ((epoch + 1) // step_size)
    return schedule


def _decay_mask(params: Any) -> Any:
    """True where weight decay applies. The reference decays every param
    of the encoder and pose nets (plain param groups, `trainer.py:68,
    92-94`) but only conv *kernels* of the depth decoder (`group_weight`,
    `trainer.py:74-75`). With a top-level {"encoder","depth",...} tree we
    reproduce that; for bare trees we decay everything except leaves
    named 'bias'."""
    def mask_fn(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        if keys and keys[0] in ("encoder", "pose_encoder", "pose"):
            return True
        return keys[-1] not in ("bias",)
    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(base_lr: float, steps_per_epoch: int,
                   scheduler_step_size: int = 15,
                   weight_decay: float = 1e-5) -> optax.GradientTransformation:
    return optax.chain(
        optax.masked(optax.add_decayed_weights(weight_decay), _decay_mask),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(
            steplr_schedule(base_lr, steps_per_epoch, scheduler_step_size)),
    )

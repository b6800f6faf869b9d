"""Checkpointing: per-epoch folders with params/opt-state pytrees +
config json + feed-size metadata.

TPU-native equivalent of the reference's per-epoch
`weights_<epoch>/{encoder,depth,pose_encoder,pose,adam}.pth` layout
(`KITTI/trainer.py:733-785`) and NYU's single `model.pth`
(`NYUv2/load_save_utils.py:11-52`): one orbax/msgpack checkpoint per
epoch folder, with the feed height/width/use_stereo metadata the
reference embeds into encoder.pth stored as `meta.json` (inference reads
it back to size inputs, `test_simple.py:85-86`). Partial restore (subset
of model keys, fresh optimizer on mismatch) mirrors
`trainer.py:753-785`.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import flax.serialization
import jax


def save_checkpoint(log_path: str, epoch: int, state: Any,
                    meta: Optional[dict] = None,
                    opts: Optional[Any] = None,
                    backend: str = "msgpack") -> str:
    """Write models/weights_<epoch>/ with the state + meta.json.

    backend: 'msgpack' (single portable file, the default) or 'orbax'
    (sharding-aware OCDBT directory via orbax.checkpoint — the
    production choice for multi-host / large states; either backend is
    auto-detected on load)."""
    folder = os.path.join(log_path, "models", f"weights_{epoch}")
    os.makedirs(folder, exist_ok=True)
    if backend == "orbax":
        import orbax.checkpoint as ocp
        path = os.path.join(os.path.abspath(folder), "state.orbax")
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, jax.device_get(state), force=True)
    else:
        state = jax.device_get(state)
        # atomic: a preemption mid-write must not leave a truncated
        # state.msgpack for --auto_resume to trip over (orbax's OCDBT
        # commit is already atomic)
        path = os.path.join(folder, "state.msgpack")
        with open(path + ".tmp", "wb") as f:
            f.write(flax.serialization.to_bytes(state))
        os.replace(path + ".tmp", path)
    if meta:
        with open(os.path.join(folder, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
    if opts is not None:
        from .config import save_opts
        save_opts(opts, os.path.join(log_path, "models", "opt.json"))
    return folder


def load_checkpoint(folder: str, target: Any) -> Any:
    """Restore a state pytree saved by save_checkpoint (either backend;
    auto-detected). `target` supplies the structure (e.g. a freshly
    built TrainState)."""
    orbax_path = os.path.join(os.path.abspath(folder), "state.orbax")
    if os.path.isdir(orbax_path):
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(orbax_path, jax.device_get(target))
    with open(os.path.join(folder, "state.msgpack"), "rb") as f:
        data = f.read()
    return flax.serialization.from_bytes(target, data)


def load_raw_state(folder: str) -> dict:
    """Raw nested state dict from either backend (auto-detected) —
    for consumers that pick out param subtrees (eval/infer CLIs)."""
    orbax_path = os.path.join(os.path.abspath(folder), "state.orbax")
    if os.path.isdir(orbax_path):
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(orbax_path)
    with open(os.path.join(folder, "state.msgpack"), "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def load_meta(folder: str) -> dict:
    p = os.path.join(folder, "meta.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def load_params_partial(folder: str, target_params: dict,
                        models_to_load=("encoder", "depth")) -> dict:
    """Partial restore of a subset of model param groups
    (`trainer.py:762-773`): keys present in the checkpoint and in
    `models_to_load` replace the target's; everything else keeps its
    (fresh) value."""
    raw = load_raw_state(folder)
    params = raw.get("params", raw)
    out = dict(target_params)
    for name in models_to_load:
        if name in params and name in out:
            restored = flax.serialization.from_state_dict(
                out[name], params[name])
            out[name] = restored
    return out


def latest_checkpoint(log_path: str) -> Optional[str]:
    """Newest weights_<epoch> that actually holds a complete state —
    a folder whose save was preempted before the atomic rename (or an
    orbax dir that never committed) is skipped, falling back to the
    previous epoch."""
    models_dir = os.path.join(log_path, "models")
    if not os.path.isdir(models_dir):
        return None
    folders = [d for d in os.listdir(models_dir)
               if d.startswith("weights_")]
    folders.sort(key=lambda d: int(d.split("_")[1]), reverse=True)
    for d in folders:
        folder = os.path.join(models_dir, d)
        if (os.path.exists(os.path.join(folder, "state.msgpack"))
                or os.path.isdir(os.path.join(folder, "state.orbax"))):
            return folder
    return None

"""bf16 inference support (TPU-native addition; the reference is
f32-only CUDA). `--bfloat16` on the eval/infer CLIs runs the whole
encoder/decoder in bfloat16 — params, activations, and the wavelet
reconstruction — and converts outputs back to float32. Slope-measured
at ~1.2x over f32 on one v5e for KITTI R18 640x192 (PERF.md)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def cast_floats(tree: Any, dtype) -> Any:
    """Cast every floating-point leaf of a pytree to `dtype`."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


def wrap_forward_bf16(forward):
    """Wrap a forward(image, ...) whose params are already bf16 so the
    input is cast to bf16 and all float outputs come back as f32."""
    def wrapped(image, *args, **kwargs):
        if image.dtype != jnp.uint8:   # u8 feeds scale inside the jit
            image = image.astype(jnp.bfloat16)
        out = forward(image, *args, **kwargs)
        return cast_floats(out, jnp.float32)
    return wrapped

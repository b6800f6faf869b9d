"""Sharding hints for height-banded (spatial) inference.

Under a 'spatial' mesh the decoder's coarse scales are a few rows tall —
smaller than the mesh axis — and GSPMD's propagation there degenerates:
round 2's dryrun showed an "Involuntary full rematerialization" on the
IDWT interleave (stack+reshape over the banded height) at the coarsest
scale. The fix is to make the resharding *planned*: coefficients whose
height can't meaningfully band (H < 2 x mesh axis) are constrained
replicated (they are tiny — 10x32x12 floats at 1024x320), and tall ones
are re-pinned to the band sharding, so every transition GSPMD inserts is
replicate->slice or band->band instead of an incompatible-shard guess.

The hints are no-ops unless `active()` is entered (jit_spatial_forward
does this), so single-device and data-parallel paths are untouched.
"""

from __future__ import annotations

import contextlib
import contextvars

_AXIS: contextvars.ContextVar = contextvars.ContextVar(
    "wmd_spatial_axis", default=None)


@contextlib.contextmanager
def active(axis: str = "spatial"):
    tok = _AXIS.set(axis)
    try:
        yield
    finally:
        _AXIS.reset(tok)


def hint(x):
    """Constrain an NHWC decoder intermediate for the spatial mesh;
    identity when no spatial context is active."""
    axis = _AXIS.get()
    if axis is None or x.ndim != 4:
        return x
    import jax
    from jax.sharding import PartitionSpec as P
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or axis not in getattr(mesh, "shape", {}):
        mesh = jax.sharding.get_mesh()
    if mesh is None or axis not in getattr(mesh, "shape", {}):
        return x
    if x.shape[1] < 2 * mesh.shape[axis]:
        return jax.lax.with_sharding_constraint(x, P())
    return jax.lax.with_sharding_constraint(x, P(None, axis))

"""Pallas banded stereo warp (ops/warp.py): parity with the gather-path
grid_sample_border on real stereo-projection grids — forward, image
gradients, and depth gradients — plus the band contract itself."""

import functools
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelet_monodepth_tpu.ops.geometry import (backproject_depth,
                                                project_3d)
from wavelet_monodepth_tpu.ops.image import grid_sample_border
from wavelet_monodepth_tpu.ops.warp import grid_sample_border_banded

H, W = 24, 40


def _setup(seed=0, tx=0.1):
    rng = np.random.RandomState(seed)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * W, 1.92 * H
    K[0, 2], K[1, 2] = 0.5 * W, 0.5 * H
    invK = np.linalg.pinv(K).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = tx
    Kb = jnp.asarray(K)[None].repeat(2, 0)
    invKb = jnp.asarray(invK)[None].repeat(2, 0)
    Tb = jnp.asarray(T)[None].repeat(2, 0)
    depth = jnp.asarray(rng.rand(2, H, W, 1).astype(np.float32) * 50 + 1)
    img = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
    return Kb, invKb, Tb, depth, img


@pytest.mark.parametrize("tx", [0.1, -0.1])
def test_banded_warp_matches_gather_forward(tx):
    Kb, invKb, Tb, depth, img = _setup(tx=tx)
    grid = project_3d(backproject_depth(depth, invKb), Kb, Tb, H, W)
    ref = grid_sample_border(img, grid)
    got = grid_sample_border_banded(img, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=0)


def test_banded_warp_gradients_match_gather():
    Kb, invKb, Tb, depth, img = _setup(seed=3)

    def loss(sampler, img, depth):
        g = project_3d(backproject_depth(depth, invKb), Kb, Tb, H, W)
        return jnp.sum(jnp.sin(sampler(img, g) * 3.0))

    gi_r, gd_r = jax.grad(lambda i, d: loss(grid_sample_border, i, d),
                          argnums=(0, 1))(img, depth)
    gi_n, gd_n = jax.grad(
        lambda i, d: loss(grid_sample_border_banded, i, d),
        argnums=(0, 1))(img, depth)
    np.testing.assert_allclose(np.asarray(gi_n), np.asarray(gi_r),
                               atol=2e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(gd_n), np.asarray(gd_r),
                               atol=2e-4, rtol=0)


def test_stereo_grid_is_row_banded():
    """The contract the kernel rests on: rectified-stereo grids stay
    within +-0.51 rows of the output row after the align_corners=False
    map, for near and far depths and both baselines."""
    for tx in (0.1, -0.1):
        for dscale in (0.15, 80.0):
            Kb, invKb, Tb, depth, _ = _setup(tx=tx)
            depth = jnp.full_like(depth, dscale)
            grid = project_3d(backproject_depth(depth, invKb), Kb, Tb,
                              H, W)
            y = ((np.asarray(grid[..., 1]) + 1.0) * H - 1.0) * 0.5
            rows = np.arange(H, dtype=np.float32)[None, :, None]
            assert np.abs(y - rows).max() < 0.51


@pytest.mark.parametrize("sampler", [grid_sample_border,
                                     grid_sample_border_banded])
def test_warp_mixed_dtypes_promote_and_stay_finite(sampler):
    """Regression: at W=640 bf16 can't represent integer coords > 256
    (clip(x, 0, 639) rounds to 640 -> out-of-bounds gather -> NaN, and
    casting y0 to a bf16 img dtype corrupted the bilinear weights).
    Coordinate/weight math must run in f32 regardless of input dtypes;
    outputs follow jnp promotion. A bf16 IMAGE with an f32 grid must be
    accurate to image quantization; bf16 GRIDS are inherently coarse
    (ulp 2-4 px at x~640) so we only require finiteness + dtype there
    (production keeps grids f32, train/kitti.py mp notes)."""
    hh, ww = 8, 640
    rng = np.random.RandomState(7)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * ww, 1.92 * hh
    K[0, 2], K[1, 2] = 0.5 * ww, 0.5 * hh
    invK = np.linalg.pinv(K).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.1
    Kb, invKb, Tb = (jnp.asarray(a)[None] for a in (K, invK, T))
    depth = jnp.asarray(rng.rand(1, hh, ww, 1).astype(np.float32) * 50 + 1)
    img = jnp.asarray(rng.rand(1, hh, ww, 3).astype(np.float32))
    grid = project_3d(backproject_depth(depth, invKb), Kb, Tb, hh, ww)
    oracle = np.asarray(grid_sample_border(img, grid))

    for idt in (jnp.float32, jnp.bfloat16):
        for gdt in (jnp.float32, jnp.bfloat16):
            out = sampler(img.astype(idt), grid.astype(gdt))
            assert out.dtype == jnp.promote_types(idt, gdt)
            o = np.asarray(out, np.float32)
            assert np.isfinite(o).all(), (idt, gdt)
            if gdt == jnp.float32:
                tol = 1e-5 if idt == jnp.float32 else 1e-2
                np.testing.assert_allclose(o, oracle, atol=tol, rtol=0)


def test_banded_warp_border_clamp():
    """Coords pushed far out of range clamp to the border, matching
    padding_mode='border' (and their gradients vanish)."""
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    u = jnp.full((1, H, W), 3.0)          # x far right
    rows = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H * 2.0 - 1.0
    v = jnp.broadcast_to(rows[None, :, None], (1, H, W))
    grid = jnp.stack([u, v], axis=-1)
    ref = grid_sample_border(img, grid)
    got = grid_sample_border_banded(img, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=0)


def test_chunked_take_identity(monkeypatch):
    """Above the gather-cliff operand bound (PERF.md "gather cliff"),
    _bilinear_gather splits its flat take along batch. The split path
    must be bit-identical to the single-take path — forward and both
    gradients — including when the batch doesn't divide evenly."""
    from wavelet_monodepth_tpu.ops import image as image_mod

    rng = np.random.RandomState(11)
    n, hh, ww = 5, 12, 30
    img = jnp.asarray(rng.rand(n, hh, ww, 3).astype(np.float32))
    grid = jnp.asarray(
        (rng.rand(n, 9, 17, 2).astype(np.float32) * 2.4 - 1.2))

    def loss(sampler_img, sampler_grid):
        return jnp.sum(jnp.sin(grid_sample_border(
            sampler_img, sampler_grid) * 3.0))

    flat = grid_sample_border(img, grid)
    gi_f, gg_f = jax.grad(loss, argnums=(0, 1))(img, grid)

    # force 2-images-per-take chunking (uneven tail chunk of 1)
    per_img = hh * ww * 4 * 3 * 4
    monkeypatch.setattr(image_mod, "_TAKE_OPERAND_MAX_BYTES", 2 * per_img)
    chunked = grid_sample_border(img, grid)
    gi_c, gg_c = jax.grad(loss, argnums=(0, 1))(img, grid)

    np.testing.assert_array_equal(np.asarray(chunked), np.asarray(flat))
    np.testing.assert_array_equal(np.asarray(gi_c), np.asarray(gi_f))
    np.testing.assert_array_equal(np.asarray(gg_c), np.asarray(gg_f))


def test_chunk_trigger_is_shape_driven():
    """Program-structure pin for the gather-cliff fix: above the 36MB
    operand bound the trace contains one take per batch chunk; below
    it, exactly one (the proven single-take program, unchanged)."""
    big = jnp.zeros((6, 320, 1024, 3), jnp.float32)      # 90 MB operand
    small = jnp.zeros((6, 192, 640, 3), jnp.float32)     # 35.4 MB
    grid = jnp.zeros((6, 2, 2, 2), jnp.float32)
    n_big = str(jax.make_jaxpr(grid_sample_border)(big, grid)
                ).count("name=_take")
    n_small = str(jax.make_jaxpr(grid_sample_border)(small, grid)
                  ).count("name=_take")
    assert n_big == 3, n_big      # 2-image takes: 31.5 MB each
    assert n_small == 1, n_small


def test_chunks_are_equal_sized(monkeypatch):
    """Equal-chunk invariant (round-5 NaN fix): on the TPU backend,
    jnp.concatenate of per-chunk takes under jax.grad miscompiles (the
    fused fwd+bwd program corrupts the last chunk's forward tail —
    tools_dev/warp_chunk_nan_experiment.py). The fix combines chunks
    with jnp.stack, which requires the chunk size to DIVIDE the local
    batch: the trace must show n/divisor equal takes, never a ragged
    tail chunk."""
    from wavelet_monodepth_tpu.ops import image as image_mod

    n, hh, ww = 5, 12, 30
    img = jnp.zeros((n, hh, ww, 3), jnp.float32)
    grid = jnp.zeros((n, 9, 17, 2), jnp.float32)
    per_img = hh * ww * 4 * 3 * 4
    # budget of 2 images/take, but 2 does not divide 5 -> fall back to
    # the largest divisor (1): five equal takes
    monkeypatch.setattr(image_mod, "_TAKE_OPERAND_MAX_BYTES", 2 * per_img)
    n_takes = str(jax.make_jaxpr(grid_sample_border)(img, grid)
                  ).count("name=_take")
    assert n_takes == 5, n_takes
    # budget fits a divisor (4 of 8) -> two equal 4-image takes
    img8 = jnp.zeros((8, hh, ww, 3), jnp.float32)
    grid8 = jnp.zeros((8, 9, 17, 2), jnp.float32)
    monkeypatch.setattr(image_mod, "_TAKE_OPERAND_MAX_BYTES",
                        4 * per_img)
    n_takes = str(jax.make_jaxpr(grid_sample_border)(img8, grid8)
                  ).count("name=_take")
    assert n_takes == 2, n_takes


def test_chunked_take_under_data_mesh(capfd):
    """Anti-cliff chunking under a 'data'-sharded batch: with
    batch_shards set, takes are sized per shard and chunk boundaries
    stay inside shards, so GSPMD partitions them without the
    "involuntary full rematerialization" replication fallback that
    shard-oblivious chunk boundaries provoke (observed: 2-image chunks
    over 8 one-image shards replicate the operand). Exact vs the
    unsharded oracle to SPMD fusion noise."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from wavelet_monodepth_tpu.ops import image as image_mod

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    rng = np.random.RandomState(13)
    n, hh, ww = 16, 16, 48          # 2 images per shard
    img = jnp.asarray(rng.rand(n, hh, ww, 3).astype(np.float32))
    grid = jnp.asarray(
        (rng.rand(n, hh, ww, 2).astype(np.float32) * 2.2 - 1.1))
    ref = np.asarray(grid_sample_border(img, grid))

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sh = NamedSharding(mesh, P("data"))
    img_s = jax.device_put(img, sh)
    grid_s = jax.device_put(grid, sh)

    import unittest.mock as mock
    per_img = hh * ww * 4 * 3 * 4
    def loss(i, g):
        return jnp.sum(jnp.sin(grid_sample_border(
            i, g, batch_shards=8) * 3.0))

    gg_ref = np.asarray(jax.grad(
        lambda g: jnp.sum(jnp.sin(grid_sample_border(img, g) * 3.0))
    )(grid))

    with mock.patch.object(image_mod, "_TAKE_OPERAND_MAX_BYTES",
                           per_img):   # force 1-image takes per shard
        out = jax.jit(functools.partial(grid_sample_border,
                                        batch_shards=8))(img_s, grid_s)
        np.asarray(out)
        # the train step differentiates through the warp wrt the grid —
        # the sharded chunked backward must stay replication-free too
        gg = jax.jit(jax.grad(loss, argnums=1))(img_s, grid_s)
        np.asarray(gg)
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(gg), gg_ref, atol=1e-4,
                               rtol=1e-4)

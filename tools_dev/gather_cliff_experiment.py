"""Isolate the XLA gather cliff (PERF.md round 3b): the full train step
pays 3.7-3.9x more gather time at 1024x320 than 832x256 (1.54x pixels).
Measures grid_sample_border fwd and fwd+bwd alone across widths, plus
row-chunked variants (split the output rows into C chunks, one take
per chunk) to test whether operand/descriptor-batch size triggers the
cliff. One process = one window.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

K1, K2 = 2, 16
B = 6
SHAPES = ((192, 640), (256, 832), (320, 1024))


def main():
    global SHAPES, B
    import argparse
    ap = argparse.ArgumentParser()
    # NOTE: chunk2 at 832x256 reproducibly CRASHES the TPU worker
    # ("kernel fault") on this platform — run single shapes to contain
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("--height", type=int, default=0)
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--chunks", type=str, default="flat,chunk2,chunk4")
    a = ap.parse_args()
    if a.width:
        SHAPES = ((a.height, a.width),)
    if a.batch:
        B = a.batch
    wanted = set(a.chunks.split(","))

    import jax
    import jax.numpy as jnp
    from wavelet_monodepth_tpu.ops.image import grid_sample_border

    def chunked_sampler(n_chunks):
        def f(img, grid):
            outs = [grid_sample_border(img, g)
                    for g in jnp.split(grid, n_chunks, axis=1)]
            return jnp.concatenate(outs, axis=1)
        return f

    def bsplit_sampler(n_chunks):
        # split along BATCH: shrinks the flat gather operand's row count
        # (n*h*w -> n*h*w/n_chunks), testing the operand-size hypothesis
        def f(img, grid):
            outs = [grid_sample_border(im, g)
                    for im, g in zip(jnp.split(img, n_chunks, axis=0),
                                     jnp.split(grid, n_chunks, axis=0))]
            return jnp.concatenate(outs, axis=0)
        return f

    def _coords(img, grid):
        n, h, w, c = img.shape
        x = ((grid[..., 0] + 1.0) * w - 1.0) * 0.5
        y = ((grid[..., 1] + 1.0) * h - 1.0) * 0.5
        y = jnp.clip(y, 0.0, h - 1.0)
        x = jnp.clip(x, 0.0, w - 1.0)
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        wy = (y - y0)[..., None]
        wx = (x - x0)[..., None]
        return y0, x0, wy, wx

    def _corner_stack(img):
        right = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
        down = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
        downright = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
        return jnp.concatenate([img, right, down, downright], axis=-1)

    def bta_sampler(img, grid):
        # batched take_along_axis: operand (n, h*w, 4c), per-sample rows
        n, h, w, c = img.shape
        y0, x0, wy, wx = _coords(img, grid)
        cat = _corner_stack(img).reshape(n, h * w, 4 * c)
        idx = (y0 * w + x0).reshape(n, -1, 1)
        v = jnp.take_along_axis(cat, idx, axis=1)
        v = v.reshape(y0.shape + (4, c))
        top = v[..., 0, :] * (1 - wx) + v[..., 1, :] * wx
        bot = v[..., 2, :] * (1 - wx) + v[..., 3, :] * wx
        return top * (1 - wy) + bot * wy

    def four_sampler(img, grid):
        # four narrow takes (c-wide rows), no corner stacking: tests
        # whether the 4c-wide stacked row triggers the cliff
        n, h, w, c = img.shape
        y0, x0, wy, wx = _coords(img, grid)
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        flat = img.reshape(n * h * w, c)
        base = jnp.arange(n, dtype=jnp.int32)[:, None, None] * (h * w)

        def take(yy, xx):
            gidx = (base + yy * w + xx).reshape(-1)
            return jnp.take(flat, gidx, axis=0).reshape(yy.shape + (c,))

        top = take(y0, x0) * (1 - wx) + take(y0, x1) * wx
        bot = take(y1, x0) * (1 - wx) + take(y1, x1) * wx
        return top * (1 - wy) + bot * wy

    samplers = {"flat": grid_sample_border,
                "chunk2": chunked_sampler(2),
                "chunk4": chunked_sampler(4),
                "chunk8": chunked_sampler(8),
                "bsplit2": bsplit_sampler(2),
                "bsplit3": bsplit_sampler(3),
                "bsplit6": bsplit_sampler(6),
                "bta": bta_sampler,
                "four": four_sampler}
    samplers = {k: v for k, v in samplers.items() if k in wanted}

    configs = []
    for h, w in SHAPES:
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(B, h, w, 3).astype(np.float32))
        # stereo-like grid: small x shifts, y = own row
        gy = ((np.arange(h, dtype=np.float32) + 0.5) / h * 2 - 1)
        gx = ((np.arange(w, dtype=np.float32) + 0.5) / w * 2 - 1)
        grid = np.stack(np.meshgrid(gx, gy), axis=-1)[None].repeat(B, 0)
        grid[..., 0] += rng.rand(B, h, w).astype(np.float32) * 0.06
        grid = jnp.asarray(grid.astype(np.float32))

        for name, sampler in samplers.items():
            @functools.partial(jax.jit, static_argnames="k")
            def fwd(img, grid, k, sampler=sampler):
                def body(i, c):
                    o = sampler(img + c * 1e-12, grid)
                    return c + o.sum()
                return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

            @functools.partial(jax.jit, static_argnames="k")
            def fwdbwd(img, grid, k, sampler=sampler):
                def loss(im, g):
                    return sampler(im, g).sum()
                def body(i, c):
                    gi, gg = jax.grad(loss, argnums=(0, 1))(
                        img + c * 1e-12, grid)
                    return c + gi.sum() + gg.sum()
                return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

            configs.append((f"{w}x{h}_{name}", fwd, fwdbwd, img, grid))

    for tag, fwd, fwdbwd, img, grid in configs:
        print(f"compiling {tag}...", flush=True)
        for fn in (fwd, fwdbwd):
            for k in (K1, K2):
                float(fn(img, grid, k))

    print("measuring (one window)...", flush=True)
    for tag, fwd, fwdbwd, img, grid in configs:
        for kind, fn in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
            def t(k):
                ts = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    float(fn(img, grid, k))
                    ts.append(time.perf_counter() - t0)
                return min(ts)
            ms = 1e3 * (t(K2) - t(K1)) / (K2 - K1)
            print(f"{tag} {kind}: {ms:8.3f} ms/warp", flush=True)


if __name__ == "__main__":
    main()

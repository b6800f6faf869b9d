"""(a) Spatially-packed thin-conv formulation vs plain XLA conv: pack 4
output columns into lanes via a (3, 2, 4C, 4*cout) conv — 1.5x fewer
padded MACs when cout << 128. (b) Per-piece attribution of the tile-
compact stage (where do its 6.3 ms go?). One process = one window."""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, HL, WL = 16, 48, 160
HH, WH = 96, 320
K1, K2 = 1, 9


def slope(fn, reps=3):
    for k in (K1, K2):
        fn(k)
    out = {}
    for k in (K1, K2):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(k)
            ts.append(time.perf_counter() - t0)
        out[k] = min(ts)
    return (out[K2] - out[K1]) / (K2 - K1)


def pack_weights(w, cout):
    c = w.shape[2]
    wp = np.zeros((3, 2, 4 * c, 4 * cout), np.float32)
    wnp = np.asarray(w)
    for g_out in range(4):
        for dx in range(3):
            t = g_out + dx
            dq, g_in = t // 4, t % 4
            wp[:, dq, g_in * c:(g_in + 1) * c,
               g_out * cout:(g_out + 1) * cout] = wnp[:, dx]
    return jnp.asarray(wp)


def conv_packed4(xp, wp, cout):
    bsz, hp, wpd, c4 = xp.shape
    h, w = hp - 2, wpd - 2
    npk = -(-wpd // 4)
    xpad = jnp.pad(xp, ((0, 0), (0, 0), (0, 4 * npk - wpd), (0, 0)))
    xpk = xpad.reshape(bsz, hp, npk, -1)
    y = jax.lax.conv_general_dilated(
        xpk, wp, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=xp.dtype)
    return y.reshape(bsz, h, w // 4, 4, cout).reshape(bsz, h, w, cout)


def main():
    res = {}
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)

    def run(label, fn, *args):
        @functools.partial(jax.jit, static_argnames="k")
        def bench(k, *a):
            def body(i, carry):
                aa = (a[0] + (carry * 1e-9).astype(a[0].dtype),) + a[1:]
                return carry + fn(*aa).sum().astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        try:
            t = slope(lambda k: float(bench(k, *args)))
            res[label] = round(t * 1e3, 3)
        except Exception as e:
            res[label] = f"ERR {type(e).__name__}: {str(e)[:80]}"
        print(label, res[label], flush=True)

    # ---- packed vs plain: upconv1 (96->32 @ hi-res) and head (64->6) --
    for tag, c, cout in (("upconv1", 96, 32), ("head", 64, 6),
                         ("upconv0", 64, 32)):
        hh, wh = (HL, WL) if tag == "upconv0" else (HH, WH)
        xp = jax.random.normal(ks[0], (B, hh + 2, wh + 2, c),
                               jnp.float32) * 0.5
        w = jax.random.normal(ks[1], (3, 3, c, cout)) * 0.05
        wp = pack_weights(w, cout)
        plain = lambda xp_, w_: jax.lax.conv_general_dilated(
            xp_, w_, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=xp_.dtype)
        run(f"{tag}_plain_f32", plain, xp, w)
        run(f"{tag}_packed_f32", lambda a, b: conv_packed4(a, b, cout),
            xp, wp)
        run(f"{tag}_plain_bf16", plain, xp.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16))
        run(f"{tag}_packed_bf16",
            lambda a, b: conv_packed4(a, b, cout),
            xp.astype(jnp.bfloat16), wp.astype(jnp.bfloat16))

    # ---- compact-stage attribution at (8, 32) --------------------------
    from wavelet_monodepth_tpu.ops import sparse as sp
    from wavelet_monodepth_tpu.ops.compact import _pretile, tile_scores
    from wavelet_monodepth_tpu.utils import maskgen as mg

    disp = mg.synthetic_depth_scene(B, 192, 640, seed=0)
    masks, _, _ = mg.masks_at_density(disp, 0.10)
    mask = jnp.asarray(masks[1])
    th, tw = 8, 32
    nh, nw = HH // th, WH // tw
    kcap = int(0.48 * B * nh * nw)
    x = jax.random.normal(ks[2], (B, HL, WL, 64)) * 0.5
    skip = jax.random.normal(ks[3], (B, HH, WH, 64)) * 0.5

    def piece_masks(m):
        mm = sp.stage_masks(m)
        scores = tile_scores(mm["upconv1"], th, tw)
        _, idx = jax.lax.top_k(scores, kcap)
        return idx.astype(jnp.float32)[None, None, :, None]
    run("piece_masks_topk", piece_masks, mask)

    idx = jnp.arange(kcap, dtype=jnp.int32) * 7 % (B * nh * nw)

    def piece_pretile_take(x_, s_, i_):
        xt = jnp.take(_pretile(x_, th // 2, tw // 2, nh, nw, 2), i_, 0)
        st = jnp.take(_pretile(s_, th, tw, nh, nw, 2), i_, 0)
        return xt.sum()[None, None, None, None] + st.sum()
    run("piece_pretile_take", piece_pretile_take, x, skip, idx)

    xg = jax.random.normal(ks[4], (kcap, th // 2 + 4, tw // 2 + 4, 64))
    sg = jax.random.normal(ks[5], (kcap, th + 4, tw + 4, 64))
    w0 = jax.random.normal(ks[6], (3, 3, 64, 32)) * 0.05
    w1 = jax.random.normal(ks[7], (3, 3, 96, 32)) * 0.05

    def piece_convs(xg_, sg_, w0_, w1_):
        from wavelet_monodepth_tpu.ops.image import upsample_nearest2x
        cv = lambda a, b: jax.lax.conv_general_dilated(
            a, b, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x0 = jax.nn.elu(cv(xg_, w0_))
        u = upsample_nearest2x(x0)
        cat = jnp.concatenate([u, sg_], axis=-1)
        x1 = jax.nn.elu(cv(cat, w1_))
        return x1
    run("piece_convs_on_tiles", piece_convs, xg, sg, w0, w1)

    rows = jax.random.normal(ks[4], (kcap, th, tw, 32))

    def piece_scatter(r_, i_):
        out = jnp.zeros((B * nh * nw, th, tw, 32), r_.dtype)
        return out.at[i_].set(r_)
    run("piece_scatter", piece_scatter, rows, idx)

    print(json.dumps(res))


if __name__ == "__main__":
    main()

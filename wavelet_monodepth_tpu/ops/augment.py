"""Color-jitter math shared by the host (numpy) and device (jax.numpy)
augmentation paths.

The reference jitters on the host inside DataLoader workers
(torchvision ColorJitter on PIL images, `KITTI/datasets/
mono_dataset.py:87-104`). TPU-natively the same four adjustments
(brightness/contrast/saturation blends + an HSV hue rotation) are pure
pointwise tensor math, so the default train pipeline ships uint8 frames
plus four scalars per item and applies them *inside the jitted step*,
where XLA fuses them into the input cast for free — the host neither
jitters nor converts to float, and the host->device image payload drops
4x (uint8) plus the whole color_aug copy. `color_jitter(...)` is that
math, written against a module handle so the host fallback
(`--host_augment`, numpy) and the device path are the same code and can
be asserted equal.

Semantics match PIL's enhance chain in float instead of uint8: each
enhance blends in f32 and clips to [0,1] without PIL's intermediate
uint8 rounding, and hue rotates float HSV instead of PIL's 8-bit H
channel (<=1/255-scale differences; the jitter is already a documented
approximation of torchvision's composed ColorJitter, DEVIATIONS #23).
"""

from __future__ import annotations

import numpy as np

# luminance weights of PIL's L mode ("ITU-R 601-2"), used by both the
# contrast mean and the saturation grayscale (ImageEnhance.Color/.Contrast)
_LUMA = (0.299, 0.587, 0.114)


def _rgb_to_hsv(xp, r, g, b):
    mx = xp.maximum(r, xp.maximum(g, b))
    mn = xp.minimum(r, xp.minimum(g, b))
    d = mx - mn
    safe_d = xp.where(d == 0, 1.0, d)
    h = xp.where(
        mx == r, ((g - b) / safe_d) % 6.0,
        xp.where(mx == g, (b - r) / safe_d + 2.0,
                 (r - g) / safe_d + 4.0))
    h = xp.where(d == 0, 0.0, h) / 6.0
    s = xp.where(mx == 0, 0.0, d / xp.where(mx == 0, 1.0, mx))
    return h, s, mx


def _hsv_to_rgb(xp, h, s, v):
    i = xp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype("int32") % 6
    r = xp.where(i == 0, v, xp.where(i == 1, q, xp.where(
        i == 2, p, xp.where(i == 3, p, xp.where(i == 4, t, v)))))
    g = xp.where(i == 0, t, xp.where(i == 1, v, xp.where(
        i == 2, v, xp.where(i == 3, q, xp.where(i == 4, p, p)))))
    b = xp.where(i == 0, p, xp.where(i == 1, p, xp.where(
        i == 2, t, xp.where(i == 3, v, xp.where(i == 4, v, q)))))
    return r, g, b


def color_jitter(img, brightness, contrast, saturation, hue, xp=np):
    """Jitter float [0,1] RGB images (..., H, W, 3), same op order as the
    host pipeline (brightness -> contrast -> saturation -> hue, the
    enhance chain of `mono_dataset.py:98-104`'s ColorJitter params).

    The four factors may be scalars or arrays broadcastable over the
    leading dims — pass shape (N, 1, 1, 1) for per-item params of an
    NHWC batch. Identity is (1, 1, 1, 0).
    """
    b = xp.asarray(brightness, xp.float32)
    c = xp.asarray(contrast, xp.float32)
    s = xp.asarray(saturation, xp.float32)
    h = xp.asarray(hue, xp.float32)
    img = xp.asarray(img, xp.float32)

    x = xp.clip(img * b, 0.0, 1.0)
    luma = (_LUMA[0] * x[..., 0] + _LUMA[1] * x[..., 1]
            + _LUMA[2] * x[..., 2])
    # ImageEnhance.Contrast blends with a solid gray of the image's own
    # mean luminance (computed per image, post-brightness)
    mean = xp.mean(luma, axis=(-2, -1), keepdims=True)[..., None]
    x = xp.clip(mean + (x - mean) * c, 0.0, 1.0)
    luma = (_LUMA[0] * x[..., 0] + _LUMA[1] * x[..., 1]
            + _LUMA[2] * x[..., 2])[..., None]
    x = xp.clip(luma + (x - luma) * s, 0.0, 1.0)

    if h.ndim == img.ndim:          # per-item (N, 1, 1, 1) -> (N, 1, 1)
        h = h[..., 0]
    hh, ss, vv = _rgb_to_hsv(xp, x[..., 0], x[..., 1], x[..., 2])
    # the host reference path adds int(hue*255) to PIL's 8-bit H channel
    # mod 256; in float that is a (hue * 255/256)-turn rotation
    hh = (hh + h * (255.0 / 256.0)) % 1.0
    r, g, bl = _hsv_to_rgb(xp, hh, ss, vv)
    return xp.clip(xp.stack([r, g, bl], axis=-1), 0.0, 1.0)


def expand_nyu(image, depth=None, xp=np):
    """Device-side cast for NYU uint8-feed batches
    (`data/nyu.py NyuDepthDataset(uint8_feed=True)`): uint8 images
    become float [0,1]; uint8 depths get the train-transform
    centimetre clamp clip(d/255*1000, 10, 1000) — same op order as the
    host float path (`NYUv2/data.py:107-140` semantics), so the two
    feeds are bit-identical. Float inputs pass through untouched.
    Returns `image` alone when `depth` is None (eval-step signature).
    """
    if getattr(image, "dtype", None) == xp.uint8:
        image = image.astype(xp.float32) / 255.0
    if depth is None:
        return image
    if getattr(depth, "dtype", None) == xp.uint8:
        depth = xp.clip(depth.astype(xp.float32) / 255.0 * 1000.0,
                        10.0, 1000.0)
    return image, depth


def expand_batch(inputs: dict, xp) -> dict:
    """Device-side input preprocessing for batches produced with
    `KittiRawDataset(device_augment=True)`: cast ("color_u8", fid, s)
    uint8 frames to ("color", fid, s) float [0,1] and synthesize
    ("color_aug", fid, 0) from the per-item ("jitter",) params (the
    only color_aug the step consumes — `trainer.py:231-252` encodes
    scale-0 color_aug only). No-op on float batches, so the same step
    serves both pipelines.
    """
    if not any(isinstance(k, tuple) and k[0] == "color_u8"
               for k in inputs):
        return inputs
    out = {k: v for k, v in inputs.items()
           if not (isinstance(k, tuple)
                   and k[0] in ("color_u8", "jitter"))}
    for k, v in inputs.items():
        if isinstance(k, tuple) and k[0] == "color_u8":
            out[("color", k[1], k[2])] = v.astype(xp.float32) / 255.0
    jit = inputs.get(("jitter",))
    fids = sorted({k[1] for k in inputs
                   if isinstance(k, tuple) and k[0] == "color_u8"})
    for fid in fids:
        color0 = out[("color", fid, 0)]
        if jit is None:
            out[("color_aug", fid, 0)] = color0
        else:
            p = jit.astype(xp.float32)          # (N, 4)
            bc = p[:, 0][:, None, None, None]
            cc = p[:, 1][:, None, None, None]
            sc = p[:, 2][:, None, None, None]
            hc = p[:, 3][:, None, None, None]
            out[("color_aug", fid, 0)] = color_jitter(
                color0, bc, cc, sc, hc, xp=xp)
    return out

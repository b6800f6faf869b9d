"""Device-side augmentation (ops/augment.py + data/kitti.py
device_augment): jitter math host/device equivalence, PIL proximity,
the uint8 item contract, and train-step equivalence between the float
and uint8 feeds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from wavelet_monodepth_tpu.data import kitti as kitti_data
from wavelet_monodepth_tpu.ops import augment


def _rand_img(shape=(24, 32, 3), seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def test_jitter_numpy_jax_identical():
    img = _rand_img((2, 24, 32, 3))
    p = np.array([[1.15, 0.85, 1.1, 0.07],
                  [0.82, 1.18, 0.9, -0.09]], np.float32)
    args = [p[:, i][:, None, None, None] for i in range(4)]
    want = augment.color_jitter(img, *args, xp=np)
    got = np.asarray(augment.color_jitter(jnp.asarray(img),
                                          *map(jnp.asarray, args),
                                          xp=jnp))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_jitter_identity():
    img = _rand_img()
    out = augment.color_jitter(img, 1.0, 1.0, 1.0, 0.0, xp=np)
    np.testing.assert_allclose(out, img, atol=2e-6)


def test_jitter_close_to_pil_chain():
    """Float-math jitter tracks the host PIL enhance chain: <=1-2/255
    mean (PIL rounds to uint8 between enhances; hue rides PIL's lossy
    8-bit HSV roundtrip — DEVIATIONS #23 territory, both approximate
    torchvision's composed ColorJitter)."""
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 255, (64, 96, 3), np.uint8)
    img = Image.fromarray(arr)
    for seed in range(3):
        r = np.random.RandomState(seed)
        p = dict(brightness=r.uniform(.8, 1.2), contrast=r.uniform(.8, 1.2),
                 saturation=r.uniform(.8, 1.2), hue=r.uniform(-.1, .1))
        pil = np.asarray(kitti_data._apply_jitter(img, p),
                         np.float32) / 255.0
        got = augment.color_jitter(arr.astype(np.float32) / 255.0,
                                   p["brightness"], p["contrast"],
                                   p["saturation"], p["hue"], xp=np)
        d = np.abs(got - pil)
        assert d.mean() < 0.01 and d.max() < 0.09, (d.mean(), d.max())


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_aug")
    drive = "2011_09_26/2011_09_26_drive_0001_sync"
    rng = np.random.RandomState(0)
    for side in (2, 3):
        d = root / drive / f"image_0{side}" / "data"
        d.mkdir(parents=True)
        for f in range(3):
            arr = rng.randint(0, 255, (96, 320, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{f:010d}.jpg")
    return str(root), drive


def _datasets(kitti_tree, **kw):
    root, drive = kitti_tree
    files = [f"{drive} 1 l"]
    return kitti_data.KittiRawDataset(
        root, files, height=64, width=96, frame_idxs=[0, "s"],
        is_train=True, **kw)


def test_device_augment_item_contract(kitti_tree):
    ds = _datasets(kitti_tree, device_augment=True, aug_scales=(0,),
                   other_frame_scales=(0,))
    item = ds.item(0)
    assert item[("color_u8", "0", 0)].dtype == np.uint8
    assert item[("color_u8", "0", 3)].shape == (8, 12, 3)
    assert ("color_u8", "s", 0) in item
    assert ("color_u8", "s", 1) not in item    # trimmed
    assert ("color", "0", 0) not in item       # uint8 feed only
    assert item[("jitter",)].shape == (4,)


def test_trimmed_float_item(kitti_tree):
    ds = _datasets(kitti_tree, aug_scales=(0,), other_frame_scales=(0,))
    item = ds.item(0)
    assert ("color", "0", 3) in item           # smoothness pyramid kept
    assert ("color_aug", "0", 0) in item
    assert ("color_aug", "0", 1) not in item   # only scale 0 is encoded
    assert ("color", "s", 1) not in item


def test_expand_batch_matches_host_path(kitti_tree):
    import random
    # seed 5 draws do_aug=True (and do_flip=True): the jitter path is
    # actually exercised, not the identity shortcut
    rng_a, rng_b = random.Random(5), random.Random(5)
    host = _datasets(kitti_tree).item(0, rng_a)
    dev = _datasets(kitti_tree, device_augment=True).item(0, rng_b)
    batch = {k: jnp.asarray(v[None]) for k, v in dev.items()}
    out = augment.expand_batch(batch, jnp)
    # colors: bit-equal (same uint8 pixels, same /255 cast)
    for s in range(4):
        np.testing.assert_array_equal(
            np.asarray(out[("color", "0", s)][0]), host[("color", "0", s)])
    # color_aug: same jitter params through the float math vs PIL chain
    d = np.abs(np.asarray(out[("color_aug", "0", 0)][0])
               - host[("color_aug", "0", 0)])
    assert d.mean() < 0.012 and d.max() < 0.12, (d.mean(), d.max())


def test_expand_batch_noop_on_float_batches():
    from wavelet_monodepth_tpu.train.kitti import synthetic_batch
    from wavelet_monodepth_tpu.utils.config import KittiOptions
    opts = KittiOptions(use_stereo=True, frame_ids=(0,), height=64,
                        width=96)
    batch = synthetic_batch(opts, 1)
    assert augment.expand_batch(batch, jnp) is batch


def test_train_step_equal_between_feeds(kitti_tree):
    """is_train=False items draw identity jitter, so the float feed and
    the uint8+device-augment feed must produce (near-)identical losses
    through the jitted step — the 1e-5 slack is the float HSV
    roundtrip of the identity hue rotation."""
    from wavelet_monodepth_tpu.train.kitti import KittiTrainSetup
    from wavelet_monodepth_tpu.utils.config import KittiOptions
    root, drive = kitti_tree
    files = [f"{drive} 0 l", f"{drive} 2 l"]
    opts = KittiOptions(use_stereo=True, frame_ids=(0,), height=64,
                        width=96, use_wavelets=True, batch_size=2)
    mk = lambda dev: kitti_data.KittiRawDataset(
        root, files, 64, 96, [0, "s"], is_train=False,
        aug_scales=(0,), other_frame_scales=(0,), device_augment=dev)
    collate = lambda ds: {
        k: jnp.asarray(np.stack([ds.item(i)[k] for i in range(2)]))
        for k in ds.item(0)}
    setup = KittiTrainSetup(opts, steps_per_epoch=10)
    step = setup.jit_train_step()    # donates the state: init per call
    rng = jax.random.PRNGKey(1)
    _, losses_f = step(setup.init_state(jax.random.PRNGKey(0)),
                       collate(mk(False)), rng)
    _, losses_u = step(setup.init_state(jax.random.PRNGKey(0)),
                       collate(mk(True)), rng)
    np.testing.assert_allclose(float(losses_u["loss"]),
                               float(losses_f["loss"]), rtol=1e-4)


def test_nyu_gamma_lut_bit_exact():
    """The 256-entry LUT gamma equals the reference's float-pow-per-
    pixel (`NYUv2/data.py:205-214`) bit-for-bit on uint8 images."""
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 255, (48, 64, 3), np.uint8)
    for g in (0.8, 1.0, 1.25, 1.1034):
        want = (255.0 * np.power(
            np.asarray(arr, np.float32) / 255.0, g)).astype(np.uint8)
        lut = (255.0 * np.power(
            np.arange(256, dtype=np.float32) / 255.0,
            np.float32(g))).astype(np.uint8)
        np.testing.assert_array_equal(lut[arr], want)


def _nyu_datasets(tmp_path, **kw):
    import io
    import zipfile
    from wavelet_monodepth_tpu.data import nyu as nyu_data
    path = tmp_path / "nyu_data.zip"
    rng = np.random.RandomState(3)
    with zipfile.ZipFile(path, "w") as zf:
        rows = []
        for i in range(2):
            img = Image.fromarray(rng.randint(0, 255, (480, 640, 3),
                                              dtype=np.uint8))
            dep = Image.fromarray(
                (rng.rand(480, 640) * 255).astype(np.uint8))
            ib, db = io.BytesIO(), io.BytesIO()
            img.save(ib, "PNG")
            dep.save(db, "PNG")
            zf.writestr(f"data/img_{i}.png", ib.getvalue())
            zf.writestr(f"data/dep_{i}.png", db.getvalue())
            rows.append(f"data/img_{i}.png,data/dep_{i}.png")
        zf.writestr("data/nyu2_train.csv", "\n".join(rows))
    data, pairs = nyu_data.load_zip_to_mem(str(path))
    return (nyu_data.NyuDepthDataset(data, pairs, is_224=True, **kw),
            nyu_data.NyuDepthDataset(data, pairs, is_224=True,
                                     uint8_feed=True, **kw))


def test_nyu_uint8_feed_bit_identical(tmp_path):
    """Float feed and uint8 feed + expand_nyu: bit-equal images AND
    depths (every augmentation already happens on uint8 pixels; the
    float cast/clamp commute with the ship)."""
    import random
    ds_f, ds_u = _nyu_datasets(tmp_path, is_train=True)
    for i in range(2):
        a = ds_f.item(i, random.Random(i))
        b = ds_u.item(i, random.Random(i))
        assert b["image"].dtype == np.uint8
        assert b["depth"].dtype == np.uint8
        img, dep = augment.expand_nyu(
            jnp.asarray(b["image"]), jnp.asarray(b["depth"]), jnp)
        np.testing.assert_array_equal(np.asarray(img), a["image"])
        np.testing.assert_array_equal(np.asarray(dep), a["depth"])


def test_nyu_train_step_equal_between_feeds(tmp_path):
    """One jitted NYU train step from the same init: identical losses
    through the float and uint8 feeds."""
    from wavelet_monodepth_tpu.train.nyu import NyuTrainSetup
    from wavelet_monodepth_tpu.utils.config import NyuOptions
    import random
    ds_f, ds_u = _nyu_datasets(tmp_path, is_train=False)
    opts = NyuOptions(encoder_type="mobilenet_light", use_224=True,
                      use_wavelets=True, batch_size=2)
    setup = NyuTrainSetup(opts)
    step = setup.jit_train_step()
    losses = {}
    for label, ds in (("f32", ds_f), ("u8", ds_u)):
        batch = {k: jnp.asarray(np.stack(
            [ds.item(i, random.Random(i))[k] for i in range(2)]))
            for k in ds.item(0, random.Random(0))}
        _, l = step(setup.init_state(jax.random.PRNGKey(0)),
                    batch["image"], batch["depth"])
        losses[label] = float(l["loss"])
    assert losses["u8"] == pytest.approx(losses["f32"], rel=1e-6)


def test_train_step_device_augment_train_items(kitti_tree):
    """Jittered uint8 feed through the mixed-precision step: finite
    loss, params update."""
    from wavelet_monodepth_tpu.train.kitti import KittiTrainSetup
    from wavelet_monodepth_tpu.utils.config import KittiOptions
    import random
    root, drive = kitti_tree
    files = [f"{drive} 1 l", f"{drive} 2 l"]
    opts = KittiOptions(use_stereo=True, frame_ids=(0,), height=64,
                        width=96, use_wavelets=True, batch_size=2,
                        bfloat16=True)
    ds = kitti_data.KittiRawDataset(
        root, files, 64, 96, [0, "s"], is_train=True,
        aug_scales=(0,), other_frame_scales=(0,), device_augment=True)
    items = [ds.item(i, random.Random(f"0/0/{i}")) for i in range(2)]
    batch = {k: jnp.asarray(np.stack([it[k] for it in items]))
             for k in items[0]}
    setup = KittiTrainSetup(opts, steps_per_epoch=10)
    state = setup.init_state(jax.random.PRNGKey(0))
    step = setup.jit_train_step(mixed_precision=True)
    new_state, losses = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["loss"]))
    assert int(new_state.step) == 1

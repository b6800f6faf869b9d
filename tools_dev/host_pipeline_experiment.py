"""Host input-pipeline throughput (VERDICT r2 #3 'Done' criterion):
measure imgs/s of the threaded loader feeding the KITTI train config
(stereo pair, 4-scale pyramid, jitter) and of the native C++ decoder,
against the device step rate (b12 640x192 = ~121 imgs/s f32, PERF.md).

Fabricates full-res KITTI jpgs (1242x375) so decode cost is realistic.
Run: python tools_dev/host_pipeline_experiment.py
"""

import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

DRIVE = "2011_09_26/2011_09_26_drive_0001_sync"
N_IMGS = 24
H, W = 192, 640


def fabricate(root):
    rng = np.random.RandomState(0)
    for side in (2, 3):
        d = os.path.join(root, DRIVE, f"image_0{side}", "data")
        os.makedirs(d, exist_ok=True)
        for f in range(N_IMGS):
            arr = rng.randint(0, 255, (375, 1242, 3), dtype=np.uint8)
            Image.fromarray(arr).save(
                os.path.join(d, f"{f:010d}.jpg"), quality=92)


def main():
    from wavelet_monodepth_tpu.data import native_loader as nl
    from wavelet_monodepth_tpu.data.kitti import KittiRawDataset
    from wavelet_monodepth_tpu.data.loader import parallel_batches

    root = tempfile.mkdtemp(prefix="wmd_host_pipe_")
    fabricate(root)
    files = [f"{DRIVE} {f} l" for f in range(N_IMGS)]
    ds = KittiRawDataset(root, files, H, W, [0, "s"],
                         target_scales=[0, 1, 2, 3], is_train=True)

    # the default train-CLI feed since round 3c: uint8 ship, jitter on
    # device, color_aug/other-frame pyramid trimmed to what the step reads
    ds_u8 = KittiRawDataset(root, files, H, W, [0, "s"],
                            target_scales=[0, 1, 2, 3], is_train=True,
                            aug_scales=(0,), other_frame_scales=(0,),
                            device_augment=True)

    for label, d in (("f32", ds), ("u8", ds_u8)):
        nbytes = sum(v.nbytes for v in d.item(0).values())
        print(f"host->device payload [{label}]: "
              f"{nbytes / 1e6:.2f} MB/item")

    ncpu = os.cpu_count()
    print(f"host cpus: {ncpu}")
    batch = 12
    for label, d in (("f32+host-jitter (reference-shaped)", ds),
                     ("u8+device-augment (default)", ds_u8)):
        key = ("color", "0", 0) if ("color", "0", 0) in d.item(0) \
            else ("color_u8", "0", 0)
        for nw in (0, 1, 2, 4, 8):
            it = parallel_batches(d, batch, num_workers=nw, shuffle=False)
            next(it)                          # warm (thread pool spin-up)
            t0 = time.time()
            n = 0
            for _ in range(6):
                b = next(it)
                n += b[key].shape[0]
            dt = time.time() - t0
            print(f"train feed [{label}] num_workers={nw}: "
                  f"{n / dt:6.1f} items/s ({1e3 * dt / n:6.1f} ms/item)")

    # NYU: zip-decode + augment + crop/resize per item, f32 vs uint8 feed
    import io
    import zipfile
    from wavelet_monodepth_tpu.data import nyu as nyu_data
    zpath = os.path.join(root, "nyu_data.zip")
    rng = np.random.RandomState(1)
    with zipfile.ZipFile(zpath, "w") as zf:
        rows = []
        for i in range(12):
            img = Image.fromarray(rng.randint(0, 255, (480, 640, 3),
                                              dtype=np.uint8))
            dep = Image.fromarray((rng.rand(480, 640) * 255
                                   ).astype(np.uint8))
            ib, db = io.BytesIO(), io.BytesIO()
            img.save(ib, "JPEG", quality=92)
            dep.save(db, "PNG")
            zf.writestr(f"data/img_{i}.jpg", ib.getvalue())
            zf.writestr(f"data/dep_{i}.png", db.getvalue())
            rows.append(f"data/img_{i}.jpg,data/dep_{i}.png")
        zf.writestr("data/nyu2_train.csv", "\n".join(rows))
    for label, u8 in (("f32", False), ("u8", True)):
        train_ds, _ = nyu_data.get_training_testing_data(
            zpath, uint8_feed=u8)
        nbytes = sum(v.nbytes for v in train_ds.item(0).values())
        print(f"NYU host->device payload [{label}]: "
              f"{nbytes / 1e6:.2f} MB/item")
        for nw in (0, 2, 4):
            it = parallel_batches(train_ds, 4, num_workers=nw,
                                  shuffle=False)
            next(it)
            t0 = time.time()
            n = 0
            for _ in range(6):
                n += next(it)["image"].shape[0]
            dt = time.time() - t0
            print(f"NYU train feed [{label}] num_workers={nw}: "
                  f"{n / dt:6.1f} items/s ({1e3 * dt / n:6.1f} ms/item)")

    if nl.available():
        paths = [os.path.join(root, DRIVE, "image_02", "data",
                              f"{f:010d}.jpg") for f in range(N_IMGS)]
        for nt in (1, 2, 4, 8):
            nl.decode_resize_batch(paths[:4], H, W, num_threads=nt)
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                nl.decode_resize_batch(paths, H, W, num_threads=nt)
            dt = time.time() - t0
            n = reps * len(paths)
            print(f"native decode threads={nt}: {n / dt:6.1f} imgs/s "
                  f"({1e3 * dt / n:6.2f} ms/img; decode+resize only)")
    else:
        print("native lib not built")


if __name__ == "__main__":
    main()

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

    ncpu = os.cpu_count()
    print(f"host cpus: {ncpu}")
    batch = 12
    for nw in (0, 1, 2, 4, 8):
        it = parallel_batches(ds, batch, num_workers=nw, shuffle=False)
        next(it)                              # warm (thread pool spin-up)
        t0 = time.time()
        n = 0
        for _ in range(6):
            b = next(it)
            n += b[("color", "0", 0)].shape[0]
        dt = time.time() - t0
        print(f"train feed num_workers={nw}: {n / dt:6.1f} imgs/s "
              f"({1e3 * dt / n:6.1f} ms/img; stereo pair + 4-scale "
              f"pyramid + jitter per img)")

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

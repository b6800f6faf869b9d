"""End-to-end train-feed A/B on the real TPU: host item building +
host->device transfer (through the relay) + jitted step, float feed vs
the uint8 device-augment default.

The device-only step A/Bs (gather_fix_step_experiment) exclude
transfer; this measures what training actually pays per batch. Wall
clock over many steps in one window — the relay round trip variance
averages out; only the within-window ratio transfers off this box.

Run: python tools_dev/feed_ab_experiment.py [--steps 20] [--batch 12]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

DRIVE = "2011_09_26/2011_09_26_drive_0001_sync"
N_IMGS = 48


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
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--num_workers", type=int, default=4)
    args = ap.parse_args()

    import jax

    from wavelet_monodepth_tpu.data.kitti import KittiRawDataset
    from wavelet_monodepth_tpu.data.loader import parallel_batches
    from wavelet_monodepth_tpu.data.prefetch import to_device
    from wavelet_monodepth_tpu.train.kitti import KittiTrainSetup
    from wavelet_monodepth_tpu.utils.config import KittiOptions

    print(f"devices: {jax.devices()}")
    root = tempfile.mkdtemp(prefix="wmd_feed_ab_")
    fabricate(root)
    files = [f"{DRIVE} {f} l" for f in range(N_IMGS)]

    opts = KittiOptions(use_stereo=True, frame_ids=(0,),
                        use_wavelets=True, use_depth_hints=False,
                        height=args.height, width=args.width,
                        batch_size=args.batch, bfloat16=True)
    setup = KittiTrainSetup(opts, steps_per_epoch=100)
    step_fn = setup.jit_train_step(mixed_precision=True)
    rng = jax.random.PRNGKey(0)

    def dataset(u8):
        return KittiRawDataset(
            root, files, args.height, args.width, [0, "s"],
            target_scales=[0, 1, 2, 3], is_train=True,
            aug_scales=(0,), other_frame_scales=(0,),
            device_augment=u8)

    for label, u8 in (("u8+device-augment (default)", True),
                      ("f32+host-jitter", False)):
        it = to_device(parallel_batches(
            dataset(u8), args.batch, num_workers=args.num_workers,
            shuffle=False))
        state = setup.init_state(jax.random.PRNGKey(1))
        # warm: compile + first transfers outside the window
        for _ in range(3):
            state, losses = step_fn(state, next(it), rng)
        float(losses["loss"])
        t0 = time.time()
        for _ in range(args.steps):
            state, losses = step_fn(state, next(it), rng)
        float(losses["loss"])            # drain the async stream
        dt = time.time() - t0
        n = args.steps * args.batch
        print(f"e2e train feed [{label}]: {1e3 * dt / args.steps:7.1f} "
              f"ms/step ({n / dt:6.1f} items/s) over {args.steps} steps "
              f"b{args.batch} {args.width}x{args.height} bf16-mp")


if __name__ == "__main__":
    main()

"""KITTI odometry evaluation CLI — `KITTI/evaluate_pose.py:49-134`
equivalent: 5-frame-track ATE on odom sequences 09/10.

Usage:
  python -m wavelet_monodepth_tpu.tools.evaluate_pose --data_path \
      kitti_odom --eval_split odom_9 --load_weights_folder ckpt/
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..data import kitti as kitti_data
    from ..eval import pose_eval
    from ..models.pose import PoseDecoder
    from ..models.resnet import ResnetEncoder, num_ch_enc

    p = argparse.ArgumentParser(description="evaluate_pose")
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--eval_split", choices=["odom_9", "odom_10"],
                   required=True)
    p.add_argument("--load_weights_folder", type=str, default=None)
    p.add_argument("--torch_model_path", type=str, default=None)
    p.add_argument("--num_layers", type=int, default=18)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--splits_dir", type=str, default=None)
    args = p.parse_args(argv)

    from ..data.splits import resolve_split_dir
    seq = int(args.eval_split.split("_")[1])
    odom_dir = (os.path.join(args.splits_dir, "odom") if args.splits_dir
                else resolve_split_dir("odom", args.data_path))
    files = kitti_data.readlines(os.path.join(
        odom_dir, f"test_files_{seq:02d}.txt"))

    enc = ResnetEncoder(num_layers=args.num_layers, num_input_images=2)
    dec = PoseDecoder(num_ch_enc=num_ch_enc(args.num_layers),
                      num_input_features=1, num_frames_to_predict_for=2)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, args.height, args.width, 6), jnp.float32)
    ev = enc.init(rng, x)
    dv = dec.init(rng, [enc.apply(ev, x)])
    if args.torch_model_path:
        from . import torch_import as ti
        enc_sd = ti.load_pth(os.path.join(args.torch_model_path,
                                          "pose_encoder.pth"))
        dec_sd = ti.load_pth(os.path.join(args.torch_model_path,
                                          "pose.pth"))
        ev = ti.import_resnet_encoder(enc_sd, args.num_layers, prefix="")
        dv = ti.import_pose_decoder(dec_sd)
    elif args.load_weights_folder:
        import flax.serialization
        from ..utils.checkpoint import load_raw_state
        raw = load_raw_state(args.load_weights_folder)
        ev = {"params": flax.serialization.from_state_dict(
                  ev["params"], raw["params"]["pose_encoder"]),
              "batch_stats": flax.serialization.from_state_dict(
                  ev["batch_stats"],
                  raw["batch_stats"]["pose_encoder"])}
        dv = {"params": flax.serialization.from_state_dict(
            dv["params"], raw["params"]["pose"])}

    @jax.jit
    def pose_forward(pair):
        feats = enc.apply(ev, pair)
        return dec.apply(dv, [feats])

    ds = kitti_data.KittiRawDataset(
        args.data_path, files, args.height, args.width, [0, 1],
        is_train=False, dataset="kitti_odom", img_ext=".png")

    def pairs():
        for i in range(len(ds)):
            item = ds[i]
            yield np.concatenate([item[("color_aug", "0", 0)],
                                  item[("color_aug", "1", 0)]], axis=-1)

    print("-> Computing pose predictions")
    pred_poses = pose_eval.predict_poses(pose_forward, pairs())

    gt_path = os.path.join(args.data_path, "poses", f"{seq:02d}.txt")
    gt = np.loadtxt(gt_path).reshape(-1, 3, 4)
    mean_ate, std_ate = pose_eval.evaluate_trajectory(pred_poses, gt)
    print(f"\n   Trajectory error: {mean_ate:0.3f}, std: {std_ate:0.3f}\n")
    if args.load_weights_folder:
        out = os.path.join(args.load_weights_folder, "poses.npy")
        np.save(out, pred_poses)
        print(f"-> Predictions saved to {out}")


if __name__ == "__main__":
    main()

"""Config dataclasses mirroring the reference's argparse surfaces
flag-for-flag (`KITTI/options.py:15-255`, `NYUv2/train.py:167-199`,
`NYUv2/evaluate.py:19-51`), with the same defaults and the same
flag-coupling asserts the reference enforces at trainer construction
(`trainer.py:35-61`). Serialized as opt.json next to checkpoints like the
reference (`trainer.py:722-731`, `load_save_utils.py:42-52`).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class KittiOptions:
    # PATHS
    data_path: str = "kitti_data"
    depth_data_path: str = "kitti_data"
    log_dir: str = "log"
    # TRAINING
    model_name: str = "mdp"
    split: str = "eigen_zhou"
    num_layers: int = 18
    encoder_type: str = "resnet"           # resnet | mobilenet | mobilenet_light
    dataset: str = "kitti"                 # kitti | kitti_odom | kitti_depth
    png: bool = False
    height: int = 192
    width: int = 640
    disparity_smoothness: float = 1e-3
    smoothness_gamma: float = 2.0
    scales: tuple = (0, 1, 2, 3)
    loss_scales: tuple = (0, 1, 2, 3)
    min_depth: float = 0.1
    max_depth: float = 100.0
    use_stereo: bool = False
    frame_ids: tuple = (0, -1, 1)
    use_wavelets: bool = False
    use_sparse: bool = False
    threshold: float = 0.05
    use_depth_hints: bool = False
    depth_hint_path: Optional[str] = None
    # OPTIMIZATION
    batch_size: int = 12
    learning_rate: float = 1e-4
    start_epoch: int = 0
    num_epochs: int = 20
    scheduler_step_size: int = 15
    # ABLATION
    v1_multiscale: bool = False
    avg_reprojection: bool = False
    disable_automasking: bool = False
    no_ssim: bool = False
    weights_init: str = "pretrained"       # pretrained | scratch
    imagenet_weights_path: Optional[str] = None  # local torchvision resnet{num_layers} state_dict (.pth) for weights_init=pretrained — the reference downloads it (`resnet_encoder.py:55,82`), impossible offline (DEVIATIONS #24); depth AND pose encoders initialize from it (pose stem tiled /n like resnet_multiimage_input). Unset: scratch init, noted at startup
    pose_model_input: str = "pairs"        # pairs | all
    pose_model_type: str = "separate_resnet"  # posecnn|separate_resnet|shared
    # SYSTEM
    num_workers: int = 4
    # LOADING
    load_weights_folder: Optional[str] = None
    models_to_load: tuple = ("encoder", "depth", "pose_encoder", "pose")
    # LOGGING
    log_frequency: int = 250
    save_frequency: int = 1
    # EVALUATION
    eval_stereo: bool = False
    eval_mono: bool = False
    disable_median_scaling: bool = False
    pred_depth_scale_factor: float = 1.0
    ext_disp_to_eval: Optional[str] = None
    eval_split: str = "eigen"
    save_pred_disps: bool = False
    no_eval: bool = False
    eval_out_dir: Optional[str] = None
    post_process: bool = False
    # TPU-NATIVE additions (not in the reference)
    data_axis: int = 1                     # data-parallel mesh size
    bfloat16: bool = False                 # bf16 inference; bf16 mixed-precision training (f32 master params)
    native_decode: bool = False            # eval feed via the C++ threaded decoder (native/wmd_native.cpp; cv2 LANCZOS4 vs PIL LANCZOS differ ~1e-3/px)
    stereo_warp_kernel: str = "auto"       # "s"-frame/hint reprojection backend: "auto" = the batch-chunked flat-row gather at every shape (it beats the Pallas banded warp ops/warp.py everywhere once the XLA operand-size gather cliff is chunked away: 1.2-1.3x at 1024x320, PERF.md rounds 3c-4); "on" forces the banded kernel (re-A/B on other hardware generations), "off" forces the gather.
    checkpoint_backend: str = "msgpack"    # msgpack (portable single file) | orbax (sharding-aware OCDBT dir)
    auto_resume: bool = False              # restore the newest weights_<epoch> under log_dir/model_name and continue from epoch+1 (crash/preemption recovery; explicit --load_weights_folder wins)
    hint_disp_l1_weight: float = 0.0       # opt-in scratch-training stabilizer (DEVIATIONS.md): adds weight * masked-L1 between each scale's sigmoid disparity and the hint disparity (the loader's ("disp_hint",) key). The reference's hint loss is log(|depth diff|+1) whose gradient in disparity space scales ~depth^2, so a scratch-initialized net (no ImageNet weights available offline) collapses to a depth rail within steps; the disp-space L1 has bounded gradients. 0 (default) = reference semantics exactly
    hint_disp_l1_space: str = "log"        # space for the stabilizer L1: "log" = |log(disp+c) - log(hint+c)|, c=0.02 — scale-invariant, so far pixels (disp ~0.007 at 70 m) carry relative-error weight instead of vanishing; gradient still bounded by 1/c = 50 (vs the reference hint loss's ~depth^2 = 1e4). "disp" = plain L1 (strongest collapse protection, but far-field signal ~0)
    disp_head_bias: float = 0.0            # init-time surgery (DEVIATIONS.md): set the disparity-head conv biases so sigmoid starts near a chosen disparity (e.g. -4 -> disp ~0.018, depth ~5 m on the stable approach-from-above side). 0 (default) = untouched flax init. Pairs with hint_disp_l1_weight for from-scratch runs; the reference never needs it because it always starts from ImageNet
    host_augment: bool = False             # jitter + float-cast on the host (the reference's DataLoader semantics, PIL enhance chain). Default off: the train feed ships uint8 frames + 4 jitter scalars and the jitted step casts/jitters on device (ops/augment.py) — 4x fewer host->device bytes, ~2x less host work per item. Also controls the eval feed: default uint8 (forward casts in-jit), --host_augment restores f32
    log_always: bool = False               # keep the early log cadence (every log_frequency steps) for the WHOLE run. The reference throttles to one log per 1000 steps after step 1000 (`trainer.py:217-218`); that starves long-run telemetry (the round-5 soak saw zero loss lines after resume). Default off = reference cadence
    steps_per_call: int = 1               # K optimizer steps per jitted dispatch (train/kitti.py make_multi_train_step: lax.scan of the step over host-stacked batches). Amortizes per-dispatch runtime overhead — on a relay-attached device ~1-2 s per execute (PERF.md round-5 soak) — at the cost of K-deep input buffering; K=1 (default) = one program per step, identical math either way (scan carries the same RNG split sequence; drop-last on the per-epoch remainder)
    coordinator_address: Optional[str] = None  # multi-host: coordinator host:port for jax.distributed.initialize (same value on every host). On TPU pods leave unset — autodetected when JAX_NUM_PROCESSES/the pod runtime provide it. See MIGRATION.md "Multi-host".
    num_processes: Optional[int] = None        # multi-host: total process count (one per host)
    process_id: Optional[int] = None           # multi-host: this host's rank in [0, num_processes)

    def validate_for_training(self):
        """The reference's constructor asserts (`trainer.py:35-61`)."""
        assert not self.use_sparse, \
            "Training with sparse convolution is not implemented"
        assert self.height % 32 == 0, "'height' must be a multiple of 32"
        assert self.width % 32 == 0, "'width' must be a multiple of 32"
        assert self.frame_ids[0] == 0, "frame_ids must start with 0"
        if self.use_depth_hints:
            assert self.use_stereo or "s" in self.frame_ids, \
                "Can't use depth hints without training from stereo"
            # the hint reprojection is computed at full resolution; with
            # v1_multiscale the per-scale losses live at scale resolution
            # and the argmin concat is shape-incoherent (the reference
            # crashes the same way at trainer.py:435-443)
            assert not self.v1_multiscale, \
                "--v1_multiscale is incompatible with --use_depth_hints"
        assert self.steps_per_call >= 1, "steps_per_call must be >= 1"

    @property
    def all_frame_ids(self) -> tuple:
        """frame_ids with 's' appended under stereo (`trainer.py:55-56`)."""
        if self.use_stereo and "s" not in self.frame_ids:
            return tuple(self.frame_ids) + ("s",)
        return tuple(self.frame_ids)

    @property
    def use_pose_net(self) -> bool:
        return not (self.use_stereo and tuple(self.frame_ids) == (0,))


@dataclass
class NyuOptions:
    # mirrors NYUv2/train.py:167-199 / evaluate.py:19-51
    data_path: str = "nyu_data.zip"
    log_dir: str = "log"
    model_name: str = "nyu"
    encoder_type: str = "densenet"   # densenet|resnet|mobilenet|mobilenet_light
    num_layers: int = 161
    epochs: int = 20
    lr: float = 1e-4
    batch_size: int = 8
    use_wavelets: bool = False
    use_sparse: bool = False
    use_224: bool = False
    dw_waveconv: bool = False
    dw_upconv: bool = False
    normalize_input: bool = False  # reference default is False (train.py:187 store_true) AND the flag is a silent no-op there anyway: all three NYU encoders normalize OUT-OF-PLACE and discard the result (densenet_encoder.py:27-29), so published NYU models were trained WITHOUT input normalization. Our True performs REAL ImageNet normalization (documented deviation, DEVIATIONS.md) — never set it when loading reference checkpoints.
    pretrained_encoder: bool = True        # ImageNet encoder init (reference `model.py:19-29` pretrained=True); needs --imagenet_weights_path offline, else scratch init with a startup note. Disable: --no-pretrained_encoder
    imagenet_weights_path: Optional[str] = None  # local torchvision densenet161/resnet state_dict (.pth); see KittiOptions.imagenet_weights_path
    disparity: bool = False
    supervise_LL: bool = False
    loss_scales: tuple = (0, 1, 2, 3)
    threshold: float = 0.1
    log_frequency: int = 300
    num_workers: int = 4
    load_weights_folder: Optional[str] = None
    # TPU-NATIVE additions
    data_axis: int = 1
    bfloat16: bool = False
    checkpoint_backend: str = "msgpack"    # msgpack | orbax
    auto_resume: bool = False              # restore the newest weights_<epoch> under log_dir/model_name and continue from epoch+1 (explicit --load_weights_folder wins)
    float_feed: bool = False               # host-side float cast + centimetre clamp (the reference's ToTensor semantics). Default off: the feed ships post-resize uint8 arrays and the jitted step casts/clamps on device (ops/augment.expand_nyu) — bit-identical, 4x fewer host->device bytes
    coordinator_address: Optional[str] = None  # multi-host: coordinator host:port for jax.distributed.initialize (same value on every host)
    num_processes: Optional[int] = None        # multi-host: total process count (one per host)
    process_id: Optional[int] = None           # multi-host: this host's rank in [0, num_processes)


def save_opts(opts, path: str):
    with open(path, "w") as f:
        json.dump(dataclasses.asdict(opts), f, indent=2, default=str)


def load_opts(cls, path: str):
    with open(path) as f:
        d = json.load(f)
    names = {f.name for f in dataclasses.fields(cls)}
    kw = {}
    for k, v in d.items():
        if k in names:
            kw[k] = tuple(v) if isinstance(v, list) else v
    return cls(**kw)


def _add_dataclass_args(parser: argparse.ArgumentParser, cls):
    for f in dataclasses.fields(cls):
        name = "--" + f.name
        if f.type == "bool" or isinstance(f.default, bool):
            # --flag / --no-flag: reference-compatible store_true usage
            # PLUS the ability to disable True-default bools (e.g.
            # --no-pretrained_encoder), which plain store_true cannot
            parser.add_argument(name, action=argparse.BooleanOptionalAction,
                                default=f.default)
        elif isinstance(f.default, tuple):
            parser.add_argument(name, nargs="+", default=list(f.default))
        else:
            typ = type(f.default) if f.default is not None else str
            parser.add_argument(name, type=typ, default=f.default)


def parse_kitti_args(argv=None) -> KittiOptions:
    parser = argparse.ArgumentParser(description="WaveletMonoDepth-TPU "
                                                 "KITTI options")
    _add_dataclass_args(parser, KittiOptions)
    ns = parser.parse_args(argv)
    kw = {f.name: getattr(ns, f.name) for f in
          dataclasses.fields(KittiOptions)}
    for k in ("scales", "loss_scales", "frame_ids", "models_to_load"):
        kw[k] = tuple(int(v) if str(v).lstrip("-").isdigit() else v
                      for v in kw[k])
    return KittiOptions(**kw)


def parse_nyu_args(argv=None) -> NyuOptions:
    parser = argparse.ArgumentParser(description="WaveletMonoDepth-TPU "
                                                 "NYUv2 options")
    _add_dataclass_args(parser, NyuOptions)
    ns = parser.parse_args(argv)
    kw = {f.name: getattr(ns, f.name) for f in
          dataclasses.fields(NyuOptions)}
    kw["loss_scales"] = tuple(int(v) for v in kw["loss_scales"])
    return NyuOptions(**kw)

"""KITTI training: jitted, data-parallel train/val steps and the epoch
driver.

Functional rebuild of the reference `Trainer` (`KITTI/trainer.py:30-785`):
same model dict ("encoder"/"depth"/"pose_encoder"/"pose"), same losses
(hints vs mdp path), Adam + StepLR with group weight decay, one-batch
validation, per-epoch checkpoints with encoder-embedded feed size. The
loop itself is host-side Python; everything per-batch is one compiled XLA
program, with the batch sharded over the 'data' mesh axis and gradients
all-reduced by GSPMD (the reference is single-GPU; SURVEY §2.3).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.factory import make_depth_decoder, make_depth_encoder, \
    make_posenet
from ..ops import augment
from ..ops.geometry import transformation_from_parameters
from ..utils.config import KittiOptions
from . import losses_kitti
from .optim import make_optimizer


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class KittiTrainSetup:
    """Builds modules, initial state, and the jitted step functions."""

    def __init__(self, opts: KittiOptions, steps_per_epoch: int = 1000,
                 mesh=None):
        opts.validate_for_training()
        self.opts = opts
        self.mesh = mesh
        self.frame_ids = opts.all_frame_ids
        self.num_pose_frames = (2 if opts.pose_model_input == "pairs"
                                else len(opts.frame_ids))

        self.encoder, self.num_ch_enc = make_depth_encoder(opts)
        self.decoder = make_depth_decoder(self.num_ch_enc, opts)
        self.pose_encoder = None
        self.pose_decoder = None
        if opts.use_pose_net:
            self.pose_encoder, self.pose_decoder = make_posenet(
                opts, self.num_pose_frames, len(opts.frame_ids))

        self.optimizer = make_optimizer(
            opts.learning_rate, steps_per_epoch, opts.scheduler_step_size)

    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array) -> TrainState:
        opts = self.opts
        x = jnp.zeros((1, opts.height, opts.width, 3), jnp.float32)
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        enc_vars = self.encoder.init(r1, x)
        feats = self.encoder.apply(enc_vars, x)
        dec_vars = self.decoder.init(r2, feats)
        params = {"encoder": enc_vars["params"],
                  "depth": dec_vars["params"]}
        batch_stats = {"encoder": enc_vars.get("batch_stats", {})}
        if self.pose_decoder is not None:
            if self.pose_encoder is not None:
                px = jnp.zeros((1, opts.height, opts.width,
                                3 * self.num_pose_frames), jnp.float32)
                pe_vars = self.pose_encoder.init(r3, px)
                params["pose_encoder"] = pe_vars["params"]
                batch_stats["pose_encoder"] = pe_vars.get("batch_stats", {})
                pfeats = self.pose_encoder.apply(pe_vars, px)
                pd_vars = self.pose_decoder.init(r4, [pfeats])
            else:
                px = jnp.zeros((1, opts.height, opts.width,
                                3 * self.num_pose_frames), jnp.float32)
                pd_vars = self.pose_decoder.init(r4, px)
            params["pose"] = pd_vars["params"]
        params, batch_stats = self._imagenet_init(params, batch_stats)
        params = self._disp_head_surgery(params)
        opt_state = self.optimizer.init(params)
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=opt_state, step=jnp.int32(0))

    def _imagenet_init(self, params, batch_stats):
        """weights_init=pretrained (`resnet_encoder.py:55,82`): replace
        the depth and pose encoders' scratch init with a local
        torchvision resnet state_dict. Offline-honest: without
        --imagenet_weights_path the flag falls back to scratch with a
        note (the reference would download — impossible here,
        DEVIATIONS #24)."""
        opts = self.opts
        if opts.weights_init != "pretrained":
            return params, batch_stats
        path = getattr(opts, "imagenet_weights_path", None)
        if not path:
            if jax.process_index() == 0:
                print("weights_init=pretrained but no "
                      "--imagenet_weights_path: scratch init (no "
                      "network egress; point it at a local torchvision "
                      "resnet state_dict to reproduce the reference's "
                      "ImageNet start)")
            return params, batch_stats
        from ..tools import torch_import as ti
        sd = ti.load_pth(path)
        ev = ti.import_resnet_encoder(sd, opts.num_layers, prefix="")
        params["encoder"] = ev["params"]
        batch_stats["encoder"] = ev["batch_stats"]
        if "pose_encoder" in params:
            pv = ti.import_resnet_encoder_multiimage(
                sd, opts.num_layers, self.num_pose_frames, prefix="")
            params["pose_encoder"] = pv["params"]
            batch_stats["pose_encoder"] = pv["batch_stats"]
        if jax.process_index() == 0:
            print(f"ImageNet init: encoder{' + pose_encoder' if 'pose_encoder' in params else ''} from {path}")
        return params, batch_stats

    def _disp_head_surgery(self, params):
        """opts.disp_head_bias != 0 (from-scratch stabilizer, see
        utils/config.py): set every disparity-head conv bias so sigmoid
        starts near the chosen disparity instead of ~0.5. Heads:
        wavelet decoder's LL head (``waveconv_4_ll/conv/bias`` —
        disp is built from 2^i * sigmoid(LL-head) / 2^s) and the
        baseline decoder's per-scale ``dispconv_i/bias``. Init-value
        change only — the param tree (and so checkpoint/importer
        compatibility) is untouched."""
        b = float(getattr(self.opts, "disp_head_bias", 0.0) or 0.0)
        if not b:
            return params
        dp = params["depth"]
        n = 0
        if "waveconv_4_ll" in dp:
            old = dp["waveconv_4_ll"]["conv"]["bias"]
            dp["waveconv_4_ll"]["conv"]["bias"] = jnp.full_like(old, b)
            n += 1
        for k, v in dp.items():
            if k.startswith("dispconv_"):
                v["bias"] = jnp.full_like(v["bias"], b)
                n += 1
        assert n, "disp_head_bias set but no disparity head found"
        return params

    # ------------------------------------------------------------------
    def _predict_poses(self, params, batch_stats, inputs, train: bool):
        """`trainer.py:254-310` (pairs mode; 'all' mode concatenates)."""
        opts = self.opts
        out = {}
        new_stats = {}
        if self.num_pose_frames == 2:
            feats0 = inputs[("color_aug", "0", 0)]
            for f_i in self.frame_ids[1:]:
                if f_i == "s":
                    continue
                if f_i < 0:
                    pose_in = jnp.concatenate(
                        [inputs[("color_aug", str(f_i), 0)], feats0], axis=-1)
                else:
                    pose_in = jnp.concatenate(
                        [feats0, inputs[("color_aug", str(f_i), 0)]], axis=-1)
                if opts.pose_model_type == "separate_resnet":
                    variables = {"params": params["pose_encoder"],
                                 "batch_stats":
                                     batch_stats["pose_encoder"]}
                    if train:
                        pfeats, upd = self.pose_encoder.apply(
                            variables, pose_in, train=True,
                            mutable=["batch_stats"])
                        new_stats["pose_encoder"] = upd["batch_stats"]
                    else:
                        pfeats = self.pose_encoder.apply(variables, pose_in)
                    aa, tr = self.pose_decoder.apply(
                        {"params": params["pose"]}, [pfeats])
                elif opts.pose_model_type == "posecnn":
                    aa, tr = self.pose_decoder.apply(
                        {"params": params["pose"]}, pose_in)
                else:
                    raise NotImplementedError(opts.pose_model_type)
                out[("axisangle", 0, f_i)] = aa
                out[("translation", 0, f_i)] = tr
                out[("cam_T_cam", 0, f_i)] = transformation_from_parameters(
                    aa[:, 0], tr[:, 0], invert=(f_i < 0))
        else:
            # 'all' mode (`trainer.py:289-308`): one pass over all
            # temporal frames stacked channel-wise.
            temporal = [f for f in self.frame_ids if f != "s"]
            pose_in = jnp.concatenate(
                [inputs[("color_aug", str(f), 0)] for f in temporal],
                axis=-1)
            if opts.pose_model_type == "separate_resnet":
                variables = {"params": params["pose_encoder"],
                             "batch_stats": batch_stats["pose_encoder"]}
                if train:
                    pfeats, upd = self.pose_encoder.apply(
                        variables, pose_in, train=True,
                        mutable=["batch_stats"])
                    new_stats["pose_encoder"] = upd["batch_stats"]
                else:
                    pfeats = self.pose_encoder.apply(variables, pose_in)
                aa, tr = self.pose_decoder.apply(
                    {"params": params["pose"]}, [pfeats])
            elif opts.pose_model_type == "posecnn":
                aa, tr = self.pose_decoder.apply(
                    {"params": params["pose"]}, pose_in)
            else:
                raise NotImplementedError(opts.pose_model_type)
            for idx, f_i in enumerate(self.frame_ids[1:]):
                if f_i == "s":
                    continue
                out[("axisangle", 0, f_i)] = aa
                out[("translation", 0, f_i)] = tr
                out[("cam_T_cam", 0, f_i)] = transformation_from_parameters(
                    aa[:, idx], tr[:, idx])
        return out, new_stats

    # ------------------------------------------------------------------
    def forward(self, params, batch_stats, inputs, rng, train: bool):
        """`process_batch` (`trainer.py:231-252`): encoder -> decoder ->
        pose -> warps -> losses."""
        opts = self.opts
        new_stats = dict(batch_stats)
        enc_vars = {"params": params["encoder"],
                    "batch_stats": batch_stats["encoder"]}
        if train:
            feats, upd = self.encoder.apply(
                enc_vars, inputs[("color_aug", "0", 0)], train=True,
                mutable=["batch_stats"])
            new_stats["encoder"] = upd["batch_stats"]
        else:
            feats = self.encoder.apply(enc_vars, inputs[("color_aug", "0", 0)])
        outputs = self.decoder.apply({"params": params["depth"]}, feats)

        pose_T = None
        if self.pose_decoder is not None:
            pose_T, pstats = self._predict_poses(params, batch_stats,
                                                 inputs, train)
            new_stats.update(pstats)
            outputs.update(pose_T)

        outputs = losses_kitti.generate_images_pred(inputs, outputs, opts,
                                                    pose_T)
        if opts.use_depth_hints:
            losses = losses_kitti.compute_losses_hints(inputs, outputs,
                                                       opts, rng)
        else:
            losses = losses_kitti.compute_losses_mdp(inputs, outputs,
                                                     opts, rng)
        return outputs, losses, new_stats

    # ------------------------------------------------------------------
    def make_train_step(self, mixed_precision: bool = False):
        """mixed_precision=True runs the NETWORKS (encoder/decoder/pose)
        forward+backward in bfloat16 with float32 master params and
        optimizer state (TPU-native addition; the reference trains
        f32-only). Only the net inputs (color_aug) are cast: the
        geometry/warp path stays f32 (bf16's 8-bit mantissa is ~2 px at
        640-wide sampling grids) via jnp type promotion against the f32
        K/inv_K and color tensors. The cast sits inside loss_fn, so
        jax.grad transposes it back: gradients arrive f32 at the master
        params; BN running stats and logged losses are re-cast to f32."""
        from ..utils.precision import cast_floats

        def train_step(state: TrainState, inputs: Dict, rng: jax.Array):
            # uint8 feed + on-device jitter (data/kitti.py
            # device_augment): cast/augment inside the jit so XLA fuses
            # it into the input pipeline; no-op on float batches
            inputs = augment.expand_batch(inputs, jnp)

            def loss_fn(params):
                if mixed_precision:
                    params = cast_floats(params, jnp.bfloat16)
                    # batch_stats stay f32: flax computes batch statistics
                    # in f32 regardless of activation dtype and train-mode
                    # BN output never reads the running stats, so keeping
                    # them f32 makes the momentum update exact (casting
                    # them to bf16 quantized the running mean/var ~0.4%
                    # every step for zero speedup).
                    ins = {k: (v.astype(jnp.bfloat16)
                               if k[0] == "color_aug" else v)
                           for k, v in inputs.items()}
                else:
                    ins = inputs
                outputs, losses, new_stats = self.forward(
                    params, state.batch_stats, ins, rng, train=True)
                if mixed_precision:
                    losses = cast_floats(losses, jnp.float32)
                    new_stats = cast_floats(new_stats, jnp.float32)
                return losses["loss"], (losses, new_stats)

            grads, (losses, new_stats) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(params=params, batch_stats=new_stats,
                                   opt_state=opt_state,
                                   step=state.step + 1)
            return new_state, losses
        return train_step

    def make_eval_step(self):
        def eval_step(state: TrainState, inputs: Dict, rng: jax.Array):
            inputs = augment.expand_batch(inputs, jnp)
            outputs, losses, _ = self.forward(
                state.params, state.batch_stats, inputs, rng, train=False)
            return outputs, losses
        return eval_step

    def jit_train_step(self, mixed_precision: bool = False):
        """Sharding is carried by input placement: put the state with
        `parallel.mesh.replicate` and batches with `shard_batch`, and
        GSPMD partitions the step (gradient psum over 'data')."""
        return jax.jit(self.make_train_step(mixed_precision),
                       donate_argnums=(0,))

    # ------------------------------------------------------------------
    def make_multi_train_step(self, k: int,
                              mixed_precision: bool = False):
        """K train steps per dispatch: `lax.scan` of the single step
        over a stacked batch dict (leaves [K, B, ...]).

        TPU-native dispatch amortization: one compiled program per K
        optimizer steps, so per-dispatch host/runtime overhead (on a
        relay-attached device ~1-2 s per execute+fetch, PERF.md round-5
        soak finding) is paid once per K steps instead of per step. The
        RNG carry reproduces the host loop's `split` sequence exactly,
        so K=2 equals two single-step calls bit-for-bit (tested); the
        returned losses keep the per-sub-step values stacked on a
        leading K axis."""
        step = self.make_train_step(mixed_precision)

        def multi_step(state: TrainState, stacked_inputs: Dict,
                       rng: jax.Array):
            def body(carry, inputs):
                st, r = carry
                r, sub = jax.random.split(r)
                st, losses = step(st, inputs, sub)
                return (st, r), losses

            (state, _), losses = jax.lax.scan(
                body, (state, rng), stacked_inputs, length=k)
            return state, losses
        return multi_step

    def jit_multi_train_step(self, k: int, mixed_precision: bool = False):
        return jax.jit(self.make_multi_train_step(k, mixed_precision),
                       donate_argnums=(0,))


def synthetic_batch(opts: KittiOptions, batch_size: int,
                    rng: Optional[jax.Array] = None) -> Dict:
    """Random batch with the dataset contract (`mono_dataset.py:150-271`)
    for smoke tests / compile checks."""
    import numpy as np
    H, W = opts.height, opts.width
    rs = np.random.RandomState(0)
    inputs: Dict = {}
    for fid in opts.all_frame_ids:
        for s in opts.scales:
            h, w = H // 2 ** s, W // 2 ** s
            inputs[("color", str(fid), s)] = jnp.asarray(
                rs.rand(batch_size, h, w, 3), jnp.float32)
            inputs[("color_aug", str(fid), s)] = inputs[("color", str(fid),
                                                         s)]
    for s in opts.scales:
        K = np.eye(4, dtype=np.float32)
        K[0, 0], K[1, 1] = 0.58 * (W // 2 ** s), 1.92 * (H // 2 ** s)
        K[0, 2], K[1, 2] = 0.5 * (W // 2 ** s), 0.5 * (H // 2 ** s)
        inputs[("K", s)] = jnp.tile(jnp.asarray(K)[None],
                                    (batch_size, 1, 1))
        inputs[("inv_K", s)] = jnp.linalg.inv(inputs[("K", s)])
    if opts.use_stereo:
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.1
        inputs[("stereo_T",)] = jnp.tile(jnp.asarray(T)[None],
                                      (batch_size, 1, 1))
    if opts.use_depth_hints:
        inputs[("depth_hint",)] = jnp.asarray(
            rs.rand(batch_size, H, W, 1) * 10 + 1, jnp.float32)
        inputs[("depth_hint_mask",)] = jnp.ones((batch_size, H, W, 1),
                                             jnp.float32)
    return inputs

"""NYUv2 supervised training: jitted train/val steps.

Rebuild of `NYUv2/train.py:165-352`: Adam(lr) without weight decay
(`:241`), forward Haar DWT(J=4) on the normalized GT depth for
coefficient supervision/logging (`:258,288-302`), loss =
sum_s 0.1 * L1(bilinear-up(disp_s, x2^s, align_corners=True), depth_n)
over loss scales (`:298-314`), optional LL supervision /2^4 (`:316-323`).
`--disparity` trains on DepthNorm(depth) = 10/depth (`NYUv2/utils.py:24`,
with train depths in centimetres: maxDepth=1000cm/100 = 10m).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.factory import make_nyu_decoder, make_nyu_encoder
from ..ops import augment
from ..ops.image import resize_bilinear
from ..ops.wavelets import haar_dwt_J
from ..utils.config import NyuOptions

Array = jnp.ndarray


def depth_norm(depth: Array, max_depth: float = 10.0) -> Array:
    return max_depth / depth


@flax.struct.dataclass
class NyuTrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class NyuTrainSetup:
    def __init__(self, opts: NyuOptions):
        self.opts = opts
        self.encoder, self.num_ch_enc = make_nyu_encoder(opts)
        self.decoder = make_nyu_decoder(self.num_ch_enc, opts)
        self.optimizer = optax.adam(opts.lr, b1=0.9, b2=0.999, eps=1e-8)
        self.input_hw = (224, 224) if opts.use_224 else (480, 640)
        self.depth_hw = (224, 224) if opts.use_224 else (240, 320)

    def init_state(self, rng: jax.Array) -> NyuTrainState:
        h, w = self.input_hw
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        r1, r2 = jax.random.split(rng)
        enc_vars = self.encoder.init(r1, x)
        feats = self.encoder.apply(enc_vars, x)
        dec_vars = self.decoder.init(r2, feats)
        params = {"encoder": enc_vars["params"],
                  "decoder": dec_vars["params"]}
        stats = {"encoder": enc_vars.get("batch_stats", {})}
        params, stats = self._imagenet_init(params, stats)
        return NyuTrainState(params=params, batch_stats=stats,
                             opt_state=self.optimizer.init(params),
                             step=jnp.int32(0))

    def _imagenet_init(self, params, stats):
        """pretrained_encoder (reference `model.py:19-29`,
        pretrained=True): replace the encoder's scratch init with a
        local torchvision state_dict. Offline-honest: without
        --imagenet_weights_path, scratch init with a note (the
        reference would download — impossible here, DEVIATIONS #24)."""
        opts = self.opts
        if not getattr(opts, "pretrained_encoder", False):
            return params, stats
        path = getattr(opts, "imagenet_weights_path", None)
        if not path:
            if jax.process_index() == 0:
                print("pretrained_encoder requested but no "
                      "--imagenet_weights_path: scratch init (no "
                      "network egress; point it at a local torchvision "
                      "state_dict, or pass --no-pretrained_encoder)")
            return params, stats
        if opts.encoder_type not in ("densenet", "resnet"):
            raise SystemExit(
                f"--imagenet_weights_path has no {opts.encoder_type} "
                "importer mapping (densenet/resnet supported); pass "
                "--no-pretrained_encoder")
        from ..tools import torch_import as ti
        sd = ti.load_pth(path)
        if opts.encoder_type == "densenet":
            ev = ti.import_densenet_encoder(sd, prefix="features.")
        else:
            ev = ti.import_resnet_encoder(sd, opts.num_layers, prefix="")
        params["encoder"] = ev["params"]
        stats["encoder"] = ev["batch_stats"]
        if jax.process_index() == 0:
            print(f"ImageNet init: {opts.encoder_type} encoder from "
                  f"{path}")
        return params, stats

    def forward(self, params, batch_stats, image, train: bool):
        enc_vars = {"params": params["encoder"],
                    "batch_stats": batch_stats["encoder"]}
        new_stats = dict(batch_stats)
        if train:
            feats, upd = self.encoder.apply(enc_vars, image, train=True,
                                            mutable=["batch_stats"])
            new_stats["encoder"] = upd["batch_stats"]
        else:
            feats = self.encoder.apply(enc_vars, image)
        outputs = self.decoder.apply({"params": params["decoder"]}, feats)
        return outputs, new_stats

    def compute_losses(self, outputs: Dict, depth_n: Array) -> Dict:
        opts = self.opts
        losses: Dict = {}
        total = 0.0
        out_scales = [s for s in range(4) if ("disp", s) in outputs]
        for scale in out_scales:
            pred = outputs[("disp", scale)]
            if scale > 0:
                pred = resize_bilinear(pred, pred.shape[1] * 2 ** scale,
                                       pred.shape[2] * 2 ** scale,
                                       align_corners=True)
            l_depth = jnp.mean(jnp.abs(pred - depth_n))
            loss = 0.1 * l_depth
            if scale in opts.loss_scales:
                total = total + loss
            losses[f"loss/{scale}"] = loss
            losses[f"loss_depth/{scale}"] = l_depth
        if opts.use_wavelets and ("wavelets", 3, "LL") in outputs:
            yl_gt, _ = haar_dwt_J(depth_n, 4)
            l_ll = jnp.mean(jnp.abs(outputs[("wavelets", 3, "LL")]
                                    - yl_gt)) / (2.0 ** 4)
            losses["loss_LL3"] = l_ll
            if opts.supervise_LL:
                total = total + l_ll
        losses["loss"] = total
        return losses

    def make_train_step(self, mixed_precision: bool = False):
        """mixed_precision runs the nets in bfloat16 with f32 master
        params/optimizer (see train/kitti.py for the scheme); the L1/DWT
        loss arithmetic promotes back to f32 against the f32 target."""
        from ..utils.precision import cast_floats

        def step(state: NyuTrainState, image: Array, depth: Array):
            # uint8 feed (data/nyu.py uint8_feed): cast + centimetre
            # clamp inside the jit; bit-identical no-op on float feeds
            image, depth = augment.expand_nyu(image, depth, jnp)
            depth_n = (depth_norm(depth) if self.opts.disparity else depth)

            def loss_fn(params):
                if mixed_precision:
                    params = cast_floats(params, jnp.bfloat16)
                    # batch_stats stay f32 (see train/kitti.py: flax
                    # computes batch stats in f32; train-mode BN never
                    # reads running stats, so the momentum update is
                    # exact in f32).
                    img = image.astype(jnp.bfloat16)
                else:
                    img = image
                outputs, new_stats = self.forward(params, state.batch_stats,
                                                  img, train=True)
                losses = self.compute_losses(outputs, depth_n)
                if mixed_precision:
                    losses = cast_floats(losses, jnp.float32)
                    new_stats = cast_floats(new_stats, jnp.float32)
                return losses["loss"], (losses, new_stats)

            grads, (losses, new_stats) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return NyuTrainState(params=params, batch_stats=new_stats,
                                 opt_state=opt_state,
                                 step=state.step + 1), losses
        return step

    def jit_train_step(self, mixed_precision: bool = False):
        return jax.jit(self.make_train_step(mixed_precision),
                       donate_argnums=(0,))

    def make_eval_step(self):
        def step(state: NyuTrainState, image: Array):
            image = augment.expand_nyu(image, xp=jnp)
            outputs, _ = self.forward(state.params, state.batch_stats,
                                      image, train=False)
            return outputs
        return step

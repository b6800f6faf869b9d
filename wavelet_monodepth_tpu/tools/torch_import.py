"""Torch-checkpoint importer: reference .pth state_dicts -> flax variables.

The reference publishes checkpoints as per-model .pth files
(`KITTI/trainer.py:733-751`: encoder.pth with embedded height/width/
use_stereo, depth.pth, pose*.pth; NYU single model.pth,
`NYUv2/load_save_utils.py:11-20`). This module maps those state_dicts
(torchvision-style names for encoders; `decoder.<i>.*` ModuleList names
for the decoders, cf. `depth_decoder.py:122,218`) onto our flax module
trees so published weights can be evaluated for parity.

Conventions: torch conv weights are OIHW -> transposed to HWIO; BatchNorm
weight/bias -> scale/bias params, running stats -> batch_stats.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

Params = Dict[str, Any]


def load_pth(path: str) -> dict[str, np.ndarray]:
    """Load a torch .pth into numpy arrays (torch CPU required)."""
    import torch
    raw = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for k, v in raw.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().numpy()
        else:
            out[k] = v     # metadata ints like height/width/use_stereo
    return out


def _conv_w(v: np.ndarray) -> np.ndarray:
    return np.transpose(v, (2, 3, 1, 0))   # OIHW -> HWIO


def _dw_conv_w(v: np.ndarray) -> np.ndarray:
    """Depthwise torch weight (C,1,kh,kw) -> HWIO (kh,kw,1,C)."""
    return np.transpose(v, (2, 3, 1, 0))


def _set(tree: dict, path: list[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _put_convbn(params: dict, stats: dict, sd: dict, tprefix: str,
                jpath: list[str], depthwise: bool = False):
    """Map torch '<tprefix>.weight' conv + sibling bn onto our _ConvBN."""
    _set(params, jpath + ["conv", "kernel"],
         _dw_conv_w(sd[f"{tprefix}.weight"]) if depthwise
         else _conv_w(sd[f"{tprefix}.weight"]))


def _put_bn(params: dict, stats: dict, sd: dict, tprefix: str,
            jpath: list[str]):
    _set(params, jpath + ["scale"], sd[f"{tprefix}.weight"])
    _set(params, jpath + ["bias"], sd[f"{tprefix}.bias"])
    _set(stats, jpath + ["mean"], sd[f"{tprefix}.running_mean"])
    _set(stats, jpath + ["var"], sd[f"{tprefix}.running_var"])


# ---------------------------------------------------------------------------
# ResNet encoder (torchvision names, under the reference's "encoder." scope,
# `resnet_encoder.py:62-98`).
# ---------------------------------------------------------------------------

_RESNET_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                  101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
_RESNET_BOTTLENECK = {18: False, 34: False, 50: True, 101: True, 152: True}


def import_resnet_encoder(sd: dict, num_layers: int,
                          prefix: str = "encoder.") -> dict:
    """Returns flax variables {params, batch_stats} for ResnetEncoder.
    Accepts both the reference's 'encoder.'-scoped checkpoints and raw
    torchvision state_dicts (prefix='')."""
    params: dict = {}
    stats: dict = {}
    p = prefix
    _put_convbn(params, stats, sd, f"{p}conv1", ["stem"])
    _put_bn(params, stats, sd, f"{p}bn1", ["stem", "bn"])
    # fix: conv lives under stem/conv, bn under stem/bn
    params["stem"] = {"conv": {"kernel": _conv_w(sd[f"{p}conv1.weight"])},
                      "bn": params["stem"]["bn"]}
    nconvs = 3 if _RESNET_BOTTLENECK[num_layers] else 2
    for li, nblocks in enumerate(_RESNET_BLOCKS[num_layers]):
        for b in range(nblocks):
            t = f"{p}layer{li + 1}.{b}."
            name = f"layer{li + 1}_{b}"
            for k in range(1, nconvs + 1):
                _set(params, [name, f"conv{k}", "conv", "kernel"],
                     _conv_w(sd[f"{t}conv{k}.weight"]))
                _put_bn(params, stats, sd, f"{t}bn{k}",
                        [name, f"conv{k}", "bn"])
            if f"{t}downsample.0.weight" in sd:
                _set(params, [name, "downsample", "conv", "kernel"],
                     _conv_w(sd[f"{t}downsample.0.weight"]))
                _put_bn(params, stats, sd, f"{t}downsample.1",
                        [name, "downsample", "bn"])
    return {"params": params, "batch_stats": stats}


def import_resnet_encoder_multiimage(sd: dict, num_layers: int,
                                     num_input_images: int,
                                     prefix: str = "") -> dict:
    """ImageNet resnet weights for the MULTI-image pose encoder: the
    stem conv kernel is tiled along input channels and divided by the
    image count, exactly the reference's `resnet_multiimage_input`
    (`resnet_encoder.py:55`: cat([conv1.weight] * n, 1) / n). Default
    prefix='' takes a raw torchvision state_dict."""
    v = import_resnet_encoder(sd, num_layers, prefix=prefix)
    if num_input_images > 1:
        k = v["params"]["stem"]["conv"]["kernel"]     # HWIO
        v["params"]["stem"]["conv"]["kernel"] = np.concatenate(
            [np.asarray(k)] * num_input_images, axis=2) / num_input_images
    return v


# MobileNetV2 settings table (`mobilenetv2_encoder.py:97-105`): the
# expand-1 first block has a 2-entry Sequential layout, the rest 4-entry.
_MBV2_SETTINGS = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                  (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2))


def import_mobilenetv2_encoder(sd: dict, use_last_layer: bool = True,
                               prefix: str = "") -> dict:
    """Reference `MobileNetV2Encoder` state_dict -> flax variables for
    models/mobilenetv2.MobileNetV2Encoder.

    The reference registers its layers directly as `features.<i>`
    (`mobilenetv2_encoder.py:113-134`: ModuleList, no wrapper scope like
    the resnet's 'encoder.'), so checkpoints saved by the trainer carry
    raw `features.` names; prefix exists for re-scoped dumps. Sequential
    child indices inside each InvertedResidual follow
    `mobilenetv2_encoder.py:55-71`: with expansion it is
    [ConvBNReLU6(pw), ConvBNReLU6(dw), Conv2d, BatchNorm2d]; the
    expand_ratio=1 first block drops the pw stage."""
    params: dict = {}
    stats: dict = {}
    p = prefix

    def put(tconv, tbn, jpath, depthwise=False):
        _set(params, jpath + ["conv", "kernel"],
             _dw_conv_w(sd[f"{tconv}.weight"]) if depthwise
             else _conv_w(sd[f"{tconv}.weight"]))
        _put_bn(params, stats, sd, tbn, jpath + ["bn"])

    put(f"{p}features.0.0", f"{p}features.0.1", ["stem"])
    bi = 0
    for t, _c, n, _s in _MBV2_SETTINGS:
        for _ in range(n):
            base = f"{p}features.{bi + 1}.conv"
            name = f"block_{bi}"
            if t != 1:
                put(f"{base}.0.0", f"{base}.0.1", [name, "expand"])
                put(f"{base}.1.0", f"{base}.1.1", [name, "depthwise"],
                    depthwise=True)
                put(f"{base}.2", f"{base}.3", [name, "project"])
            else:
                put(f"{base}.0.0", f"{base}.0.1", [name, "depthwise"],
                    depthwise=True)
                put(f"{base}.1", f"{base}.2", [name, "project"])
            bi += 1
    if use_last_layer:
        put(f"{p}features.17.0", f"{p}features.17.1", ["last"])
    return {"params": params, "batch_stats": stats}


def encoder_metadata(sd: dict) -> dict:
    """height/width/use_stereo ints the reference embeds in encoder.pth
    (`trainer.py:743-747`)."""
    meta = {}
    for k in ("height", "width", "use_stereo"):
        if k in sd:
            v = sd[k]
            meta[k] = int(v) if not hasattr(v, "item") else int(v.item())
    return meta


# ---------------------------------------------------------------------------
# KITTI decoders ("decoder.<idx>." ModuleList names).
# ---------------------------------------------------------------------------

def _convblock_from(sd: dict, t: str) -> dict:
    """Reference ConvBlock: .conv.conv.{weight,bias} (pad has no params)."""
    return {"conv": {"kernel": _conv_w(sd[f"{t}conv.conv.weight"]),
                     "bias": sd[f"{t}conv.conv.bias"]}}


def _conv3x3_from(sd: dict, t: str) -> dict:
    return {"kernel": _conv_w(sd[f"{t}conv.weight"]),
            "bias": sd[f"{t}conv.bias"]}


def _waveconv_from(sd: dict, t: str) -> dict:
    """Reference Sequential(Conv1x1, LReLU, Conv3x3): .0.conv / .2.conv."""
    return {"squeeze": {"kernel": _conv_w(sd[f"{t}0.conv.weight"]),
                        "bias": sd[f"{t}0.conv.bias"]},
            "conv": {"kernel": _conv_w(sd[f"{t}2.conv.weight"]),
                     "bias": sd[f"{t}2.conv.bias"]}}


def import_kitti_wavelet_decoder(sd: dict) -> dict:
    """DepthWaveProgressiveDecoder / SparseDepthWaveProgressiveDecoder
    weights -> KittiWaveletDecoder params. ModuleList order per
    `depth_decoder.py:88-122`: for i=4..1 [upconv_i_0, upconv_i_1,
    (waveconv_4_0 at i==4), waveconv_i_1, waveconv_i_-1]."""
    params: dict = {}
    idx = 0
    for i in range(4, 0, -1):
        params[f"upconv_{i}_0"] = _convblock_from(sd, f"decoder.{idx}.")
        idx += 1
        params[f"upconv_{i}_1"] = _convblock_from(sd, f"decoder.{idx}.")
        idx += 1
        if i == 4:
            params["waveconv_4_ll"] = _waveconv_from(sd, f"decoder.{idx}.")
            idx += 1
        params[f"waveconv_{i}_pos"] = _waveconv_from(sd, f"decoder.{idx}.")
        idx += 1
        params[f"waveconv_{i}_neg"] = _waveconv_from(sd, f"decoder.{idx}.")
        idx += 1
    return {"params": params}


def import_kitti_baseline_decoder(sd: dict, scales=(0, 1, 2, 3)) -> dict:
    """DepthDecoder weights (`depth_decoder.py:30-48`): ModuleList =
    upconv pairs for i=4..0 then dispconvs for s in scales."""
    params: dict = {}
    idx = 0
    for i in range(4, -1, -1):
        params[f"upconv_{i}_0"] = _convblock_from(sd, f"decoder.{idx}.")
        idx += 1
        params[f"upconv_{i}_1"] = _convblock_from(sd, f"decoder.{idx}.")
        idx += 1
    for s in scales:
        params[f"dispconv_{s}"] = _conv3x3_from(sd, f"decoder.{idx}.")
        idx += 1
    return {"params": params}


def import_pose_decoder(sd: dict) -> dict:
    """PoseDecoder (`pose_decoder.py:25-33`): ModuleList order squeeze,
    pose0, pose1, pose2 under 'net.'."""
    def cv(t):
        return {"kernel": _conv_w(sd[f"{t}.weight"]),
                "bias": sd[f"{t}.bias"]}
    return {"params": {"squeeze": cv("net.0"), "pose_0": cv("net.1"),
                       "pose_1": cv("net.2"), "pose_2": cv("net.3")}}


def import_pose_cnn(sd: dict) -> dict:
    """PoseCNN (`pose_cnn.py:19-34`)."""
    def cv(t):
        return {"kernel": _conv_w(sd[f"{t}.weight"]),
                "bias": sd[f"{t}.bias"]}
    params = {f"conv_{i}": cv(f"net.{i}") for i in range(7)}
    params["pose_conv"] = cv("pose_conv")
    return {"params": params}


# ---------------------------------------------------------------------------
# NYU decoders + DenseNet encoder (single model.pth with encoder.* /
# decoder.* scopes, `NYUv2/load_save_utils.py`).
# ---------------------------------------------------------------------------

def import_densenet_encoder(sd: dict,
                            prefix: str = "encoder.original_model.features."
                            ) -> dict:
    """torchvision densenet161.features names -> DenseNet161Encoder."""
    params: dict = {}
    stats: dict = {}
    params["conv0"] = {"kernel": _conv_w(sd[f"{prefix}conv0.weight"])}
    _put_bn(params, stats, sd, f"{prefix}norm0", ["norm0", "bn"])
    block_config = (6, 12, 36, 24)
    for bi, n in enumerate(block_config):
        for li in range(n):
            t = f"{prefix}denseblock{bi + 1}.denselayer{li + 1}."
            name = f"block{bi + 1}_layer{li + 1}"
            _put_bn(params, stats, sd, f"{t}norm1", [name, "norm1", "bn"])
            _set(params, [name, "conv1", "kernel"],
                 _conv_w(sd[f"{t}conv1.weight"]))
            _put_bn(params, stats, sd, f"{t}norm2", [name, "norm2", "bn"])
            _set(params, [name, "conv2", "kernel"],
                 _conv_w(sd[f"{t}conv2.weight"]))
        if bi != len(block_config) - 1:
            t = f"{prefix}transition{bi + 1}."
            name = f"transition{bi + 1}"
            _put_bn(params, stats, sd, f"{t}norm", [name, "norm", "bn"])
            _set(params, [name, "conv", "kernel"],
                 _conv_w(sd[f"{t}conv.weight"]))
    return {"params": params, "batch_stats": stats}


def import_nyu_wave_decoder(sd: dict, prefix: str = "decoder.") -> dict:
    """DecoderWave weights (`densedepth_decoder.py:92-115`) ->
    NyuDecoderWave params."""
    p = prefix

    def c3(t):
        return {"kernel": _conv_w(sd[f"{p}{t}.conv.weight"]),
                "bias": sd[f"{p}{t}.conv.bias"]}

    params = {"conv2": c3("conv2"), "wave1_ll": c3("wave1_ll"),
              "wave1": c3("wave1"), "wave2": c3("wave2"),
              "wave3": c3("wave3")}
    for up in ("up1", "up2", "up3"):
        params[up] = {"convA": c3(f"{up}.convA")}
    return {"params": params}


# ---------------------------------------------------------------------------
# Reverse direction: flax variables -> reference-named torch state dicts,
# so models trained HERE run in the reference unchanged (the reference
# loads per-model .pth state dicts, `trainer.py:752-773` /
# `NYUv2/load_save_utils.py:11-20`). Exact inverses of the importers
# above; round-trip tested bit-for-bit (tests/test_torch_export.py).
# ---------------------------------------------------------------------------

def _conv_w_inv(v: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(v), (3, 2, 0, 1)))


def _get(tree: dict, path: list[str]) -> np.ndarray:
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node)


def _take_bn(sd: dict, params: dict, stats: dict, tprefix: str,
             jpath: list[str]):
    sd[f"{tprefix}.weight"] = _get(params, jpath + ["scale"])
    sd[f"{tprefix}.bias"] = _get(params, jpath + ["bias"])
    sd[f"{tprefix}.running_mean"] = _get(stats, jpath + ["mean"])
    sd[f"{tprefix}.running_var"] = _get(stats, jpath + ["var"])


def resnet_layers_of_params(params: dict) -> int:
    """Infer the resnet depth from a ResnetEncoder param tree."""
    bottleneck = "conv3" in params["layer1_0"]

    def nblocks(li):
        n = 0
        while f"layer{li}_{n}" in params:
            n += 1
        return n

    cfg = tuple(nblocks(i) for i in (1, 2, 3, 4))
    table = {(2, 2, 2, 2): 18, (3, 4, 6, 3): 50 if bottleneck else 34,
             (3, 4, 23, 3): 101, (3, 8, 36, 3): 152}
    return table[cfg]


def export_resnet_encoder(variables: dict, num_layers: int | None = None,
                          prefix: str = "encoder.",
                          meta: dict | None = None) -> dict:
    """ResnetEncoder variables -> torchvision-named state dict (under the
    reference's 'encoder.' scope by default). `meta` embeds the
    height/width/use_stereo ints the reference writes into encoder.pth
    (`trainer.py:743-747`)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if num_layers is None:
        num_layers = resnet_layers_of_params(params)
    sd: dict = {}
    p = prefix
    sd[f"{p}conv1.weight"] = _conv_w_inv(params["stem"]["conv"]["kernel"])
    _take_bn(sd, params, stats, f"{p}bn1", ["stem", "bn"])
    nconvs = 3 if _RESNET_BOTTLENECK[num_layers] else 2
    for li, nblocks in enumerate(_RESNET_BLOCKS[num_layers]):
        for b in range(nblocks):
            t = f"{p}layer{li + 1}.{b}."
            name = f"layer{li + 1}_{b}"
            for k in range(1, nconvs + 1):
                sd[f"{t}conv{k}.weight"] = _conv_w_inv(
                    params[name][f"conv{k}"]["conv"]["kernel"])
                _take_bn(sd, params, stats, f"{t}bn{k}",
                         [name, f"conv{k}", "bn"])
            if "downsample" in params[name]:
                sd[f"{t}downsample.0.weight"] = _conv_w_inv(
                    params[name]["downsample"]["conv"]["kernel"])
                _take_bn(sd, params, stats, f"{t}downsample.1",
                         [name, "downsample", "bn"])
    if meta:
        sd.update({k: int(v) for k, v in meta.items()})
    return sd


def _convblock_to(sd: dict, t: str, node: dict):
    sd[f"{t}conv.conv.weight"] = _conv_w_inv(node["conv"]["kernel"])
    sd[f"{t}conv.conv.bias"] = np.asarray(node["conv"]["bias"])


def _waveconv_to(sd: dict, t: str, node: dict):
    sd[f"{t}0.conv.weight"] = _conv_w_inv(node["squeeze"]["kernel"])
    sd[f"{t}0.conv.bias"] = np.asarray(node["squeeze"]["bias"])
    sd[f"{t}2.conv.weight"] = _conv_w_inv(node["conv"]["kernel"])
    sd[f"{t}2.conv.bias"] = np.asarray(node["conv"]["bias"])


def export_kitti_wavelet_decoder(variables: dict) -> dict:
    """KittiWaveletDecoder params -> the reference's ModuleList names
    (inverse of import_kitti_wavelet_decoder)."""
    params = variables["params"]
    sd: dict = {}
    idx = 0
    for i in range(4, 0, -1):
        _convblock_to(sd, f"decoder.{idx}.", params[f"upconv_{i}_0"])
        idx += 1
        _convblock_to(sd, f"decoder.{idx}.", params[f"upconv_{i}_1"])
        idx += 1
        if i == 4:
            _waveconv_to(sd, f"decoder.{idx}.", params["waveconv_4_ll"])
            idx += 1
        _waveconv_to(sd, f"decoder.{idx}.", params[f"waveconv_{i}_pos"])
        idx += 1
        _waveconv_to(sd, f"decoder.{idx}.", params[f"waveconv_{i}_neg"])
        idx += 1
    return sd


def export_kitti_baseline_decoder(variables: dict,
                                  scales=(0, 1, 2, 3)) -> dict:
    params = variables["params"]
    sd: dict = {}
    idx = 0
    for i in range(4, -1, -1):
        _convblock_to(sd, f"decoder.{idx}.", params[f"upconv_{i}_0"])
        idx += 1
        _convblock_to(sd, f"decoder.{idx}.", params[f"upconv_{i}_1"])
        idx += 1
    for s in scales:
        node = params[f"dispconv_{s}"]
        sd[f"decoder.{idx}.conv.weight"] = _conv_w_inv(node["kernel"])
        sd[f"decoder.{idx}.conv.bias"] = np.asarray(node["bias"])
        idx += 1
    return sd


def export_pose_decoder(variables: dict) -> dict:
    params = variables["params"]
    sd: dict = {}
    for ours, theirs in (("squeeze", "net.0"), ("pose_0", "net.1"),
                         ("pose_1", "net.2"), ("pose_2", "net.3")):
        sd[f"{theirs}.weight"] = _conv_w_inv(params[ours]["kernel"])
        sd[f"{theirs}.bias"] = np.asarray(params[ours]["bias"])
    return sd


def export_pose_cnn(variables: dict) -> dict:
    params = variables["params"]
    sd: dict = {}
    for i in range(7):
        sd[f"net.{i}.weight"] = _conv_w_inv(params[f"conv_{i}"]["kernel"])
        sd[f"net.{i}.bias"] = np.asarray(params[f"conv_{i}"]["bias"])
    sd["pose_conv.weight"] = _conv_w_inv(params["pose_conv"]["kernel"])
    sd["pose_conv.bias"] = np.asarray(params["pose_conv"]["bias"])
    return sd


def export_densenet_encoder(variables: dict,
                            prefix: str = "encoder.original_model."
                                          "features.") -> dict:
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: dict = {}
    sd[f"{prefix}conv0.weight"] = _conv_w_inv(params["conv0"]["kernel"])
    _take_bn(sd, params, stats, f"{prefix}norm0", ["norm0", "bn"])
    block_config = (6, 12, 36, 24)
    for bi, n in enumerate(block_config):
        for li in range(n):
            t = f"{prefix}denseblock{bi + 1}.denselayer{li + 1}."
            name = f"block{bi + 1}_layer{li + 1}"
            _take_bn(sd, params, stats, f"{t}norm1", [name, "norm1", "bn"])
            sd[f"{t}conv1.weight"] = _conv_w_inv(
                params[name]["conv1"]["kernel"])
            _take_bn(sd, params, stats, f"{t}norm2", [name, "norm2", "bn"])
            sd[f"{t}conv2.weight"] = _conv_w_inv(
                params[name]["conv2"]["kernel"])
        if bi != len(block_config) - 1:
            t = f"{prefix}transition{bi + 1}."
            name = f"transition{bi + 1}"
            _take_bn(sd, params, stats, f"{t}norm", [name, "norm", "bn"])
            sd[f"{t}conv.weight"] = _conv_w_inv(
                params[name]["conv"]["kernel"])
    return sd


def export_nyu_wave_decoder(variables: dict,
                            prefix: str = "decoder.") -> dict:
    params = variables["params"]
    sd: dict = {}

    def c3(t, node):
        sd[f"{prefix}{t}.conv.weight"] = _conv_w_inv(node["kernel"])
        sd[f"{prefix}{t}.conv.bias"] = np.asarray(node["bias"])

    for n in ("conv2", "wave1_ll", "wave1", "wave2", "wave3"):
        c3(n, params[n])
    for up in ("up1", "up2", "up3"):
        c3(f"{up}.convA", params[up]["convA"])
    return sd

"""Importer tests: numeric parity on small fragments built with raw torch,
plus full structural round-trips (synthetic reference-named state dicts ->
import -> apply on the flax modules, tree structures must line up)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from wavelet_monodepth_tpu.models.decoders_kitti import (DepthDecoder,  # noqa: E402
                                                         KittiWaveletDecoder,
                                                         NUM_CH_DEC)
from wavelet_monodepth_tpu.models.layers import ConvBlock  # noqa: E402
from wavelet_monodepth_tpu.models.resnet import ResnetEncoder  # noqa: E402
from wavelet_monodepth_tpu.tools import torch_import as ti  # noqa: E402


def _shapes(tree):
    return jax.tree_util.tree_map(lambda a: tuple(a.shape), tree)


def test_convblock_numeric_parity():
    """ConvBlock import: pad-reflect conv + ELU must match torch."""
    tconv = torch.nn.Conv2d(4, 6, 3)
    x = torch.randn(1, 4, 8, 10)
    with torch.no_grad():
        ref = torch.nn.functional.elu(
            tconv(torch.nn.functional.pad(x, (1, 1, 1, 1), mode="reflect")))
    sd = {"conv.conv.weight": tconv.weight.detach().numpy(),
          "conv.conv.bias": tconv.bias.detach().numpy()}
    params = ti._convblock_from(sd, "")
    blk = ConvBlock(6, "reflect")
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    out = blk.apply({"params": params}, xj)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref.numpy(), atol=1e-5)


def _rand_sd(names_shapes):
    rng = np.random.RandomState(0)
    return {k: rng.randn(*s).astype(np.float32) * 0.05
            for k, s in names_shapes}


def _wavelet_decoder_sd(num_ch_enc=(64, 64, 128, 256, 512)):
    """Synthetic state dict with the reference's ModuleList names
    (depth_decoder.py:88-122)."""
    names = []
    idx = 0

    def convblock(i, cin, cout):
        names.append((f"decoder.{i}.conv.conv.weight", (cout, cin, 3, 3)))
        names.append((f"decoder.{i}.conv.conv.bias", (cout,)))

    def waveconv(i, cin, cmid, cout):
        names.append((f"decoder.{i}.0.conv.weight", (cmid, cin, 1, 1)))
        names.append((f"decoder.{i}.0.conv.bias", (cmid,)))
        names.append((f"decoder.{i}.2.conv.weight", (cout, cmid, 3, 3)))
        names.append((f"decoder.{i}.2.conv.bias", (cout,)))

    for i in range(4, 0, -1):
        cin0 = num_ch_enc[-1] if i == 4 else NUM_CH_DEC[i + 1]
        convblock(idx, cin0, NUM_CH_DEC[i]); idx += 1
        cin1 = NUM_CH_DEC[i] + num_ch_enc[i - 1]
        convblock(idx, cin1, NUM_CH_DEC[i]); idx += 1
        if i == 4:
            waveconv(idx, NUM_CH_DEC[4], NUM_CH_DEC[4] // 4, 1); idx += 1
        waveconv(idx, NUM_CH_DEC[i], NUM_CH_DEC[i], 3); idx += 1
        waveconv(idx, NUM_CH_DEC[i], NUM_CH_DEC[i], 3); idx += 1
    return _rand_sd(names)


def test_kitti_wavelet_decoder_import_structure():
    H, W = 64, 96
    chans = (64, 64, 128, 256, 512)
    feats = [jnp.zeros((1, H // f, W // f, c), jnp.float32)
             for f, c in zip((2, 4, 8, 16, 32), chans)]
    dec = KittiWaveletDecoder(num_ch_enc=chans)
    ref_vars = dec.init(jax.random.PRNGKey(0), feats)
    imported = ti.import_kitti_wavelet_decoder(_wavelet_decoder_sd(chans))
    assert _shapes(ref_vars["params"]) == _shapes(imported["params"])
    out = dec.apply(imported, feats)
    assert out[("disp", 0)].shape == (1, H, W, 1)
    out_sp = dec.apply(imported, feats, thresh_ratio=0.05)
    assert ("wavelet_mask", 0) in out_sp


def _resnet18_sd():
    names = [("encoder.conv1.weight", (64, 3, 7, 7))]
    for bn, c in [("encoder.bn1", 64)]:
        for suf, s in (("weight", (c,)), ("bias", (c,)),
                       ("running_mean", (c,)), ("running_var", (c,))):
            names.append((f"{bn}.{suf}", s))
    chans = [64, 64, 128, 256, 512]
    for li in range(1, 5):
        cin, cout = chans[li - 1], chans[li]
        for b in range(2):
            t = f"encoder.layer{li}.{b}"
            c_in = cin if b == 0 else cout
            names.append((f"{t}.conv1.weight", (cout, c_in, 3, 3)))
            names.append((f"{t}.conv2.weight", (cout, cout, 3, 3)))
            for k in (1, 2):
                for suf in ("weight", "bias", "running_mean", "running_var"):
                    names.append((f"{t}.bn{k}.{suf}", (cout,)))
            if b == 0 and (li > 1):
                names.append((f"{t}.downsample.0.weight", (cout, cin, 1, 1)))
                for suf in ("weight", "bias", "running_mean", "running_var"):
                    names.append((f"{t}.downsample.1.{suf}", (cout,)))
    sd = _rand_sd(names)
    # positive variances
    for k in list(sd):
        if k.endswith("running_var"):
            sd[k] = np.abs(sd[k]) + 1.0
    sd["height"], sd["width"], sd["use_stereo"] = 192, 640, 1
    return sd


def test_resnet18_import_structure():
    sd = _resnet18_sd()
    variables = ti.import_resnet_encoder(sd, 18)
    enc = ResnetEncoder(num_layers=18)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    ref_vars = enc.init(jax.random.PRNGKey(0), x)
    assert _shapes(ref_vars["params"]) == _shapes(variables["params"])
    assert _shapes(ref_vars["batch_stats"]) == _shapes(
        variables["batch_stats"])
    feats = enc.apply(variables, x)
    assert feats[-1].shape == (1, 2, 3, 512)
    meta = ti.encoder_metadata(sd)
    assert meta == {"height": 192, "width": 640, "use_stereo": 1}


def test_baseline_decoder_import_structure():
    chans = (64, 64, 128, 256, 512)
    names = []
    idx = 0
    for i in range(4, -1, -1):
        cin0 = chans[-1] if i == 4 else NUM_CH_DEC[i + 1]
        names.append((f"decoder.{idx}.conv.conv.weight",
                      (NUM_CH_DEC[i], cin0, 3, 3)))
        names.append((f"decoder.{idx}.conv.conv.bias", (NUM_CH_DEC[i],)))
        idx += 1
        cin1 = NUM_CH_DEC[i] + (chans[i - 1] if i > 0 else 0)
        names.append((f"decoder.{idx}.conv.conv.weight",
                      (NUM_CH_DEC[i], cin1, 3, 3)))
        names.append((f"decoder.{idx}.conv.conv.bias", (NUM_CH_DEC[i],)))
        idx += 1
    for s in range(4):
        names.append((f"decoder.{idx}.conv.weight", (1, NUM_CH_DEC[s], 3, 3)))
        names.append((f"decoder.{idx}.conv.bias", (1,)))
        idx += 1
    sd = _rand_sd(names)
    imported = ti.import_kitti_baseline_decoder(sd)
    dec = DepthDecoder(num_ch_enc=chans)
    feats = [jnp.zeros((1, 64 // f, 96 // f, c), jnp.float32)
             for f, c in zip((2, 4, 8, 16, 32), chans)]
    ref_vars = dec.init(jax.random.PRNGKey(0), feats)
    assert _shapes(ref_vars["params"]) == _shapes(imported["params"])
    out = dec.apply(imported, feats)
    assert out[("disp", 0)].shape == (1, 64, 96, 1)


def test_fetch_pretrained_check(tmp_path):
    """check_folder must recognize and sanity-import a synthetic KITTI
    weights folder."""
    from wavelet_monodepth_tpu.tools.fetch_pretrained import check_folder

    enc_sd = _resnet18_sd()
    dec_sd = _wavelet_decoder_sd()
    torch.save({k: torch.as_tensor(v) if not isinstance(v, int) else v
                for k, v in enc_sd.items()}, tmp_path / "encoder.pth")
    torch.save({k: torch.as_tensor(v) for k, v in dec_sd.items()},
               tmp_path / "depth.pth")
    report = check_folder(str(tmp_path))
    assert report["kind"] == "kitti"
    assert report["ok"], report["details"]


def test_fetch_pretrained_empty(tmp_path):
    from wavelet_monodepth_tpu.tools.fetch_pretrained import check_folder
    assert not check_folder(str(tmp_path))["ok"]


def _raw_torchvision_resnet18_sd():
    """The _resnet18_sd fixture with the 'encoder.' scope stripped — a
    raw torchvision state_dict, the weights_init=pretrained source."""
    sd = {}
    for k, v in _resnet18_sd().items():
        if isinstance(k, str) and k.startswith("encoder."):
            sd[k[len("encoder."):]] = v
    return sd


def test_resnet_multiimage_import_tiles_stem():
    """Pose-encoder ImageNet init (`resnet_encoder.py:55`): conv1
    weights tiled along input channels and divided by the image count;
    everything else identical to the single-image import."""
    sd = _raw_torchvision_resnet18_sd()
    single = ti.import_resnet_encoder(sd, 18, prefix="")
    multi = ti.import_resnet_encoder_multiimage(sd, 18, 2, prefix="")
    ks = np.asarray(single["params"]["stem"]["conv"]["kernel"])
    km = np.asarray(multi["params"]["stem"]["conv"]["kernel"])
    assert ks.shape[2] == 3 and km.shape[2] == 6
    np.testing.assert_allclose(km[:, :, :3], ks / 2, rtol=1e-6)
    np.testing.assert_allclose(km[:, :, 3:], ks / 2, rtol=1e-6)
    enc = ResnetEncoder(num_layers=18, num_input_images=2)
    x = jnp.zeros((1, 64, 96, 6), jnp.float32)
    feats = enc.apply(multi, x)
    assert feats[-1].shape == (1, 2, 3, 512)


def test_kitti_train_setup_imagenet_init(tmp_path):
    """weights_init=pretrained + --imagenet_weights_path: depth AND
    pose encoders start from the torchvision state_dict (stem kernels
    match; pose stem is the tiled /2 variant), and a step runs."""
    import torch

    from wavelet_monodepth_tpu.train.kitti import (KittiTrainSetup,
                                                   synthetic_batch)
    from wavelet_monodepth_tpu.utils.config import KittiOptions

    sd = _raw_torchvision_resnet18_sd()
    path = tmp_path / "resnet18-imagenet.pth"
    torch.save({k: torch.from_numpy(np.asarray(v, np.float32))
                for k, v in sd.items()}, path)

    opts = KittiOptions(use_stereo=False, frame_ids=(0, -1, 1),
                        use_wavelets=True, height=64, width=96,
                        scales=(0, 1, 2, 3), loss_scales=(0, 1, 2, 3),
                        num_layers=18, batch_size=2,
                        imagenet_weights_path=str(path))
    setup = KittiTrainSetup(opts, steps_per_epoch=10)
    state = setup.init_state(jax.random.PRNGKey(0))
    w = _conv_w_np(sd["conv1.weight"])
    np.testing.assert_allclose(
        np.asarray(state.params["encoder"]["stem"]["conv"]["kernel"]),
        w, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state.params["pose_encoder"]["stem"]["conv"]
                   ["kernel"]),
        np.concatenate([w, w], axis=2) / 2, rtol=1e-6)
    state, losses = setup.jit_train_step()(state, synthetic_batch(opts, 2),
                                           jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["loss"]))


def _conv_w_np(w):
    """OIHW -> HWIO, numpy."""
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))

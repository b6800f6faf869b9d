"""Reverse torch exporter: flax variables -> reference-named .pth state
dicts. Round trips must be bit-exact in both directions, and the CLI
must produce folders that golden_check validates (i.e. the reference
could load them)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wavelet_monodepth_tpu.tools import torch_import as ti  # noqa: E402

from test_torch_import import _resnet18_sd, _wavelet_decoder_sd  # noqa: E402


def _leaves(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_leaves(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def _assert_tree_equal(a, b):
    la, lb = _leaves(a), _leaves(b)
    assert set(la) == set(lb)
    for k in la:
        np.testing.assert_array_equal(la[k], lb[k], err_msg=k)


def _assert_sd_equal(a, b):
    """State-dict equality over array entries (metadata ints aside)."""
    ka = {k for k, v in a.items() if not isinstance(v, int)}
    kb = {k for k, v in b.items() if not isinstance(v, int)}
    assert ka == kb
    for k in ka:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


# ---------------------------------------------------------------------------
# round trips: import(export(init)) == init, export(import(sd)) == sd
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("layers", [18, 50])
def test_resnet_encoder_round_trip(layers):
    from wavelet_monodepth_tpu.models.resnet import ResnetEncoder
    enc = ResnetEncoder(num_layers=layers)
    variables = enc.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3), jnp.float32))
    sd = ti.export_resnet_encoder(variables, layers,
                                  meta={"height": 192, "width": 640,
                                        "use_stereo": 1})
    back = ti.import_resnet_encoder(sd, layers)
    _assert_tree_equal(back, variables)
    assert ti.encoder_metadata(sd) == {"height": 192, "width": 640,
                                       "use_stereo": 1}
    assert ti.resnet_layers_of_params(variables["params"]) == layers


def test_resnet18_export_inverts_reference_sd():
    sd = _resnet18_sd()
    variables = ti.import_resnet_encoder(sd, 18)
    out = ti.export_resnet_encoder(variables, 18)
    _assert_sd_equal(out, sd)


def test_kitti_wavelet_decoder_round_trip():
    from wavelet_monodepth_tpu.models.decoders_kitti import \
        KittiWaveletDecoder
    chans = (64, 64, 128, 256, 512)
    feats = [jnp.zeros((1, 64 // f, 96 // f, c), jnp.float32)
             for f, c in zip((2, 4, 8, 16, 32), chans)]
    dec = KittiWaveletDecoder(num_ch_enc=chans)
    variables = dec.init(jax.random.PRNGKey(0), feats)
    sd = ti.export_kitti_wavelet_decoder(variables)
    _assert_tree_equal(ti.import_kitti_wavelet_decoder(sd), variables)
    # and the exporter inverts the importer on reference-named dicts
    ref_sd = _wavelet_decoder_sd(chans)
    _assert_sd_equal(
        ti.export_kitti_wavelet_decoder(
            ti.import_kitti_wavelet_decoder(ref_sd)), ref_sd)


def test_kitti_baseline_decoder_round_trip():
    from wavelet_monodepth_tpu.models.decoders_kitti import DepthDecoder
    chans = (64, 64, 128, 256, 512)
    feats = [jnp.zeros((1, 64 // f, 96 // f, c), jnp.float32)
             for f, c in zip((2, 4, 8, 16, 32), chans)]
    dec = DepthDecoder(num_ch_enc=chans)
    variables = dec.init(jax.random.PRNGKey(0), feats)
    sd = ti.export_kitti_baseline_decoder(variables)
    _assert_tree_equal(ti.import_kitti_baseline_decoder(sd), variables)


def test_pose_round_trips():
    from wavelet_monodepth_tpu.models.pose import PoseCNN, PoseDecoder
    from wavelet_monodepth_tpu.models.resnet import (ResnetEncoder,
                                                     num_ch_enc)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 6), jnp.float32)
    enc = ResnetEncoder(num_layers=18, num_input_images=2)
    ev = enc.init(rng, x)
    dec = PoseDecoder(num_ch_enc=num_ch_enc(18), num_input_features=1,
                      num_frames_to_predict_for=2)
    dv = dec.init(rng, [enc.apply(ev, x)])
    _assert_tree_equal(
        ti.import_resnet_encoder(
            ti.export_resnet_encoder(ev, 18, prefix=""), 18, prefix=""),
        ev)
    _assert_tree_equal(ti.import_pose_decoder(ti.export_pose_decoder(dv)),
                       dv)
    cnn = PoseCNN(num_input_frames=2)
    cv = cnn.init(rng, x)
    _assert_tree_equal(ti.import_pose_cnn(ti.export_pose_cnn(cv)), cv)


def test_nyu_round_trips():
    from wavelet_monodepth_tpu.models.decoders_nyu import NyuDecoderWave
    from wavelet_monodepth_tpu.models.densenet import (DenseNet161Encoder,
                                                       NUM_CH_ENC)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    enc = DenseNet161Encoder(normalize_input=False)
    ev = enc.init(rng, x)
    _assert_tree_equal(
        ti.import_densenet_encoder(ti.export_densenet_encoder(ev)), ev)
    dec = NyuDecoderWave(num_ch_enc=tuple(NUM_CH_ENC), decoder_width=0.5)
    dv = dec.init(rng, enc.apply(ev, x))
    _assert_tree_equal(
        ti.import_nyu_wave_decoder(ti.export_nyu_wave_decoder(dv)), dv)


# ---------------------------------------------------------------------------
# CLI: checkpoint folder -> .pth folder that golden_check validates
# ---------------------------------------------------------------------------

def test_export_cli_kitti_checkpoint_validates(tmp_path):
    from wavelet_monodepth_tpu.models.decoders_kitti import \
        KittiWaveletDecoder
    from wavelet_monodepth_tpu.models.pose import PoseDecoder
    from wavelet_monodepth_tpu.models.resnet import (ResnetEncoder,
                                                     num_ch_enc)
    from wavelet_monodepth_tpu.tools import golden_check as gc
    from wavelet_monodepth_tpu.tools.export_torch import main as export
    from wavelet_monodepth_tpu.utils.checkpoint import save_checkpoint

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    enc = ResnetEncoder(num_layers=18)
    ev = enc.init(rng, x)
    dec = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))
    dv = dec.init(rng, enc.apply(ev, x))
    px = jnp.zeros((1, 64, 64, 6), jnp.float32)
    penc = ResnetEncoder(num_layers=18, num_input_images=2)
    pev = penc.init(rng, px)
    pdec = PoseDecoder(num_ch_enc=num_ch_enc(18), num_input_features=1,
                       num_frames_to_predict_for=2)
    pdv = pdec.init(rng, [penc.apply(pev, px)])

    state = {"params": {"encoder": ev["params"], "depth": dv["params"],
                        "pose_encoder": pev["params"],
                        "pose": pdv["params"]},
             "batch_stats": {"encoder": ev["batch_stats"],
                             "pose_encoder": pev["batch_stats"]}}
    folder = save_checkpoint(str(tmp_path), 0, state,
                             meta={"height": 192, "width": 640,
                                   "use_stereo": 1, "epoch": 0})

    out = export(["--load_weights_folder", folder,
                  "--out", str(tmp_path / "torch")])
    for f in ("encoder.pth", "depth.pth", "pose_encoder.pth", "pose.pth"):
        assert os.path.isfile(os.path.join(out, f))
    assert gc.check_kitti_weights(out, 18, 192, 640) == []
    assert gc.check_pose_weights(out) == []

    # exported values ARE the checkpoint's values
    back = ti.import_resnet_encoder(
        ti.load_pth(os.path.join(out, "encoder.pth")), 18)
    _assert_tree_equal(back["params"], ev["params"])


def test_export_cli_nyu_checkpoint_validates(tmp_path):
    from wavelet_monodepth_tpu.models.decoders_nyu import NyuDecoderWave
    from wavelet_monodepth_tpu.models.densenet import (DenseNet161Encoder,
                                                       NUM_CH_ENC)
    from wavelet_monodepth_tpu.tools import golden_check as gc
    from wavelet_monodepth_tpu.tools.export_torch import main as export
    from wavelet_monodepth_tpu.utils.checkpoint import save_checkpoint

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    enc = DenseNet161Encoder(normalize_input=False)
    ev = enc.init(rng, x)
    dec = NyuDecoderWave(num_ch_enc=tuple(NUM_CH_ENC), decoder_width=0.5)
    dv = dec.init(rng, enc.apply(ev, x))
    state = {"params": {"encoder": ev["params"],
                        "decoder": dv["params"]},
             "batch_stats": {"encoder": ev["batch_stats"]}}
    folder = save_checkpoint(str(tmp_path), 0, state, meta={"epoch": 0})

    out = export(["--load_weights_folder", folder,
                  "--out", str(tmp_path / "torch")])
    path = os.path.join(out, "model.pth")
    assert os.path.isfile(path)
    assert gc.check_nyu_weights(path) == []

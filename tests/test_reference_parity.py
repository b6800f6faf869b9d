"""End-to-end numeric parity against the ACTUAL reference implementation.

Loads the reference's decoder/pose modules from /root/reference (read-only,
executed in-process on CPU torch — never vendored), drives them and our flax
rebuilds with the SAME weights (via tools/torch_import) on the same random
inputs, and asserts output parity:

  * KITTI `DepthWaveProgressiveDecoder` dense forward
    (`KITTI/networks/decoders/depth_decoder.py:72-168`)
  * KITTI `SparseDepthWaveProgressiveDecoder` sparse forward at a real
    threshold — masks identical, disps/coefficients equal — and at
    thresh_ratio=-1 (== dense, the notebook oracle)
    (`depth_decoder.py:171-428`)
  * KITTI baseline `DepthDecoder` (`depth_decoder.py:18-69`)
  * NYU `DecoderWave` dense forward (`densedepth_decoder.py:92-148`)
  * `PoseDecoder` / `PoseCNN` (`pose_decoder.py:14-54`, `pose_cnn.py:13-50`)

The reference imports `pytorch_wavelets.IDWT`; that package is absent, so we
stub it with the closed-form Haar synthesis the reference itself spells out
(`my_iwt_once`, `depth_decoder.py:225-239`). test_idwt_stub_is_true_inverse
proves the stub is a genuine Haar inverse (analysis round-trip), so parity
via the stub is parity with Haar, not a shared bug.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wavelet_monodepth_tpu.models.decoders_kitti import (  # noqa: E402
    DepthDecoder, KittiWaveletDecoder)
from wavelet_monodepth_tpu.models.decoders_nyu import (  # noqa: E402
    NyuDecoderWave)
from wavelet_monodepth_tpu.models.pose import (  # noqa: E402
    PoseCNN, PoseDecoder)
from wavelet_monodepth_tpu.tools import torch_import as ti  # noqa: E402

REF_KITTI = "/root/reference/KITTI"
REF_NYU = "/root/reference/NYUv2"


# ---------------------------------------------------------------------------
# pytorch_wavelets stub: closed-form Haar synthesis (IDWT, haar, mode has no
# effect for J=1 synthesis of matching-size coefficients).
# ---------------------------------------------------------------------------

class _HaarIDWT(torch.nn.Module):
    def __init__(self, wave="haar", mode="zero"):
        super().__init__()
        assert wave == "haar"

    def forward(self, coeffs):
        yl, yh_list = coeffs
        (yh,) = yh_list                      # (N, C, 3, H, W)
        lf, hf = yl / 2, yh / 2
        lh, hl, hh = hf[:, :, 0], hf[:, :, 1], hf[:, :, 2]
        r00 = lf + lh + hl + hh              # (2i,   2j)
        r01 = lf + lh - hl - hh              # (2i,   2j+1)
        r10 = lf - lh + hl - hh              # (2i+1, 2j)
        r11 = lf - lh - hl + hh              # (2i+1, 2j+1)
        st = torch.stack([r00, r01, r10, r11], dim=2)   # (N, C, 4, H, W)
        n, c, _, h, w = st.shape
        return F.pixel_shuffle(st.reshape(n, c * 4, h, w), 2)


def test_idwt_stub_is_true_inverse():
    """Haar analysis of the stub's synthesis must return the coefficients."""
    g = torch.Generator().manual_seed(0)
    yl = torch.randn(2, 1, 5, 7, generator=g)
    yh = torch.randn(2, 1, 3, 5, 7, generator=g)
    x = _HaarIDWT()((yl, [yh]))
    a, b = x[:, :, 0::2, 0::2], x[:, :, 0::2, 1::2]
    c, d = x[:, :, 1::2, 0::2], x[:, :, 1::2, 1::2]
    yl2 = (a + b + c + d) / 2
    lh2 = (a + b - c - d) / 2
    hl2 = (a - b + c - d) / 2
    hh2 = (a - b - c + d) / 2
    assert torch.allclose(yl2, yl, atol=1e-6)
    assert torch.allclose(torch.stack([lh2, hl2, hh2], 2), yh, atol=1e-6)


# ---------------------------------------------------------------------------
# Reference module loading (read-only, by file path, with sys.modules hygiene)
# ---------------------------------------------------------------------------

def _install_stub():
    stub = types.ModuleType("pytorch_wavelets")
    stub.IDWT = _HaarIDWT
    sys.modules["pytorch_wavelets"] = stub


@pytest.fixture(scope="module")
def ref_kitti_decoders():
    """Reference depth_decoder module, with its sibling `layers` module."""
    _install_stub()
    saved_layers = sys.modules.pop("layers", None)
    sys.path.insert(0, REF_KITTI)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_kitti_depth_decoder",
            f"{REF_KITTI}/networks/decoders/depth_decoder.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        sys.path.remove(REF_KITTI)
        sys.modules.pop("layers", None)
        sys.modules.pop("ref_kitti_depth_decoder", None)
        if saved_layers is not None:
            sys.modules["layers"] = saved_layers


@pytest.fixture(scope="module")
def ref_nyu_decoders():
    _install_stub()
    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "networks" or k.startswith("networks.")}
    sys.path.insert(0, REF_NYU)
    try:
        mod = importlib.import_module("networks.decoders.densedepth_decoder")
        yield mod
    finally:
        sys.path.remove(REF_NYU)
        for k in list(sys.modules):
            if k == "networks" or k.startswith("networks."):
                del sys.modules[k]
        sys.modules.update(saved)


def _load_by_path(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------

NUM_CH_ENC = (64, 64, 128, 256, 512)
FEAT_HW = ((48, 80), (24, 40), (12, 20), (6, 10), (3, 5))   # 96x160 input


def _features(seed=0, num_ch=NUM_CH_ENC, hw=FEAT_HW, scale=1.0):
    g = torch.Generator().manual_seed(seed)
    feats = [scale * torch.randn(1, c, h, w, generator=g)
             for c, (h, w) in zip(num_ch, hw)]
    return feats


def _nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _sd_numpy(module: torch.nn.Module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _assert_close(ours, ref_nchw, name, atol=1e-4):
    ref = _nhwc(ref_nchw)
    got = np.asarray(ours)
    assert got.shape == ref.shape, (name, got.shape, ref.shape)
    err = np.max(np.abs(got - ref))
    assert err <= atol, f"{name}: maxerr {err}"


# ---------------------------------------------------------------------------
# KITTI wavelet decoder: dense
# ---------------------------------------------------------------------------

def test_kitti_wavelet_decoder_dense_parity(ref_kitti_decoders):
    torch.manual_seed(1)
    ref = ref_kitti_decoders.DepthWaveProgressiveDecoder(
        num_ch_enc=np.array(NUM_CH_ENC))
    ref.eval()
    feats = _features(seed=2)
    with torch.no_grad():
        ref_out = ref(feats)

    variables = ti.import_kitti_wavelet_decoder(_sd_numpy(ref))
    ours = KittiWaveletDecoder(num_ch_enc=NUM_CH_ENC)
    jfeats = [jnp.asarray(_nhwc(f)) for f in feats]
    out = ours.apply(variables, jfeats)

    for s in range(4):
        _assert_close(out[("disp", s)], ref_out[("disp", s)], f"disp{s}")
        for co in ("LL", "LH", "HL", "HH"):
            _assert_close(out[("wavelets", s, co)],
                          ref_out[("wavelets", s, co)], f"wav{s}{co}",
                          atol=2e-4)


# ---------------------------------------------------------------------------
# KITTI sparse decoder: masks identical, outputs equal; thresh -1 == dense
# ---------------------------------------------------------------------------

def test_kitti_sparse_decoder_parity(ref_kitti_decoders):
    torch.manual_seed(3)
    ref = ref_kitti_decoders.SparseDepthWaveProgressiveDecoder(
        num_ch_enc=np.array(NUM_CH_ENC))
    ref.eval()
    feats = _features(seed=4)
    thresh = 0.05
    with torch.no_grad():
        ref_out = ref(feats, thresh_ratio=thresh)

    variables = ti.import_kitti_wavelet_decoder(_sd_numpy(ref))
    ours = KittiWaveletDecoder(num_ch_enc=NUM_CH_ENC)
    jfeats = [jnp.asarray(_nhwc(f)) for f in feats]
    out = ours.apply(variables, jfeats, thresh_ratio=thresh)

    # masks must be IDENTICAL (and non-trivial for the test to mean much)
    nontrivial = 0
    for s in range(4):
        for key in ("lowres_mask", "upconv0_mask", "upsample_mask",
                    "upconv1_mask", "wavelet_mask"):
            ref_m = ref_out[(key, s)].numpy().astype(bool)
            got_m = np.asarray(out[(key, s)]).astype(bool)
            got_m = np.transpose(got_m, (0, 3, 1, 2))
            assert got_m.shape == ref_m.shape, (key, s)
            assert (got_m == ref_m).all(), f"{key}@{s} differs"
            if 0 < ref_m.mean() < 1:
                nontrivial += 1
    assert nontrivial >= 3, "threshold produced only trivial masks"

    for s in range(4):
        _assert_close(out[("disp", s)], ref_out[("disp", s)],
                      f"sparse disp{s}")
        for co in ("LH", "HL", "HH"):
            _assert_close(out[("wavelets", s, co)],
                          ref_out[("wavelets", s, co)],
                          f"sparse wav{s}{co}", atol=2e-4)

    # analytic op counters must agree with the reference's inline counts
    ref_total = float(ref_out["total_ops"])
    got_total = float(np.sum(out[("total_ops", -1)]))
    assert got_total == pytest.approx(ref_total, rel=1e-6), \
        (got_total, ref_total)
    for s in range(4):
        assert float(np.sum(out[("total_ops", s)])) == pytest.approx(
            float(ref_out[("total_ops", s)]), rel=1e-6), f"ops@{s}"


def test_kitti_sparse_thresh_minus1_is_dense(ref_kitti_decoders):
    torch.manual_seed(5)
    ref_sparse = ref_kitti_decoders.SparseDepthWaveProgressiveDecoder(
        num_ch_enc=np.array(NUM_CH_ENC))
    ref_sparse.eval()
    feats = _features(seed=6)
    with torch.no_grad():
        ref_out = ref_sparse(feats, thresh_ratio=-1)

    variables = ti.import_kitti_wavelet_decoder(_sd_numpy(ref_sparse))
    ours = KittiWaveletDecoder(num_ch_enc=NUM_CH_ENC)
    jfeats = [jnp.asarray(_nhwc(f)) for f in feats]
    out_sparse = ours.apply(variables, jfeats, thresh_ratio=-1.0)
    out_dense = ours.apply(variables, jfeats)

    for s in range(4):
        _assert_close(out_sparse[("disp", s)], ref_out[("disp", s)],
                      f"disp{s}")
        np.testing.assert_allclose(out_sparse[("disp", s)],
                                   out_dense[("disp", s)], atol=1e-5)


# ---------------------------------------------------------------------------
# KITTI baseline decoder
# ---------------------------------------------------------------------------

def test_kitti_baseline_decoder_parity(ref_kitti_decoders):
    torch.manual_seed(7)
    ref = ref_kitti_decoders.DepthDecoder(num_ch_enc=np.array(NUM_CH_ENC))
    ref.eval()
    feats = _features(seed=8)
    with torch.no_grad():
        ref_out = ref(feats)

    variables = ti.import_kitti_baseline_decoder(_sd_numpy(ref))
    ours = DepthDecoder(num_ch_enc=NUM_CH_ENC)
    jfeats = [jnp.asarray(_nhwc(f)) for f in feats]
    out = ours.apply(variables, jfeats)
    for s in range(4):
        _assert_close(out[("disp", s)], ref_out[("disp", s)], f"disp{s}")


# ---------------------------------------------------------------------------
# NYU DecoderWave
# ---------------------------------------------------------------------------

def test_nyu_decoder_wave_parity(ref_nyu_decoders):
    enc = [96, 96, 192, 384, 512]       # smaller last stage for CPU speed
    torch.manual_seed(9)
    ref = ref_nyu_decoders.DecoderWave(enc_features=enc, decoder_width=0.5)
    ref.eval()
    hw = ((128, 160), (64, 80), (32, 40), (16, 20), (8, 10))
    feats = _features(seed=10, num_ch=enc, hw=hw)
    with torch.no_grad():
        ref_out = ref(feats)

    variables = ti.import_nyu_wave_decoder(_sd_numpy(ref), prefix="")
    ours = NyuDecoderWave(num_ch_enc=enc, decoder_width=0.5)
    jfeats = [jnp.asarray(_nhwc(f)) for f in feats]
    out = ours.apply(variables, jfeats)
    for s in range(4):
        _assert_close(out[("disp", s)], ref_out[("disp", s)], f"disp{s}")
    for s, coeffs in ((2, ("LL", "LH", "HL", "HH")),
                      (1, ("LH", "HL", "HH")), (0, ("LH", "HL", "HH"))):
        for co in coeffs:
            ref_c = ref_out[("wavelets", s, co)]
            if ref_c.dim() == 4:
                _assert_close(out[("wavelets", s, co)], ref_c,
                              f"wav{s}{co}", atol=2e-4)


def test_nyu_sparse_decoder_parity(ref_nyu_decoders):
    enc = [96, 96, 192, 384, 512]
    torch.manual_seed(15)
    ref = ref_nyu_decoders.SparseDecoderWave(enc_features=enc,
                                             decoder_width=0.5)
    ref.eval()
    hw = ((128, 160), (64, 80), (32, 40), (16, 20), (8, 10))
    feats = _features(seed=16, num_ch=enc, hw=hw)
    thresh = 0.05
    with torch.no_grad():
        ref_out = ref(feats, thresh_ratio=thresh)

    variables = ti.import_nyu_wave_decoder(_sd_numpy(ref), prefix="")
    ours = NyuDecoderWave(num_ch_enc=enc, decoder_width=0.5)
    jfeats = [jnp.asarray(_nhwc(f)) for f in feats]
    out = ours.apply(variables, jfeats, thresh_ratio=thresh)

    nontrivial = 0
    for s in (0, 1):
        ref_m = ref_out[("wavelet_mask", s)].numpy().astype(bool)
        got_m = np.transpose(np.asarray(out[("wavelet_mask", s)]),
                             (0, 3, 1, 2)).astype(bool)
        assert (got_m == ref_m).all(), f"wavelet_mask@{s}"
        if 0 < ref_m.mean() < 1:
            nontrivial += 1
    assert nontrivial == 2, "threshold produced trivial masks"

    for s in range(4):
        _assert_close(out[("disp", s)], ref_out[("disp", s)],
                      f"nyu sparse disp{s}")
    for s in (0, 1, 2):
        for co in ("LH", "HL", "HH"):
            _assert_close(out[("wavelets", s, co)],
                          ref_out[("wavelets", s, co)],
                          f"nyu sparse wav{s}{co}", atol=2e-4)

    # op counters: the reference double-counts mask2idxmap(wave_mask) at its
    # last sparse scale (`densedepth_decoder.py:377-382`, DEVIATIONS #12);
    # that extra term is (H0/2)*(W0/2) of the half-res wave mask. Counters
    # are float32 on ~8e8 magnitudes, so compare at rel=1e-6.
    h0, w0 = np.asarray(out[("disp", 0)]).shape[1:3]
    ref_total = float(ref_out["total_ops"])
    got_total = float(np.sum(out[("total_ops", -1)]))
    assert got_total + (h0 // 2) * (w0 // 2) == pytest.approx(
        ref_total, rel=1e-6), (got_total, ref_total)


# ---------------------------------------------------------------------------
# Pose networks
# ---------------------------------------------------------------------------

def test_pose_decoder_parity():
    mod = _load_by_path("ref_pose_decoder",
                        f"{REF_KITTI}/networks/decoders/pose_decoder.py")
    torch.manual_seed(11)
    ref = mod.PoseDecoder(num_ch_enc=np.array(NUM_CH_ENC),
                          num_input_features=1, num_frames_to_predict_for=2)
    ref.eval()
    g = torch.Generator().manual_seed(12)
    feat = torch.randn(2, 512, 3, 5, generator=g)
    with torch.no_grad():
        ref_ax, ref_tr = ref([[feat]])

    variables = ti.import_pose_decoder(_sd_numpy(ref))
    ours = PoseDecoder(num_ch_enc=NUM_CH_ENC, num_input_features=1,
                       num_frames_to_predict_for=2)
    ax, tr = ours.apply(variables, [[jnp.asarray(_nhwc(feat))]])
    np.testing.assert_allclose(np.asarray(ax), ref_ax.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tr), ref_tr.numpy(), atol=1e-5)


def test_pose_cnn_parity():
    mod = _load_by_path("ref_pose_cnn", f"{REF_KITTI}/networks/pose_cnn.py")
    torch.manual_seed(13)
    ref = mod.PoseCNN(num_input_frames=2)
    ref.eval()
    g = torch.Generator().manual_seed(14)
    x = torch.randn(2, 6, 64, 96, generator=g)
    with torch.no_grad():
        ref_ax, ref_tr = ref(x)

    variables = ti.import_pose_cnn(_sd_numpy(ref))
    ours = PoseCNN(num_input_frames=2)
    ax, tr = ours.apply(variables, jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(ax), ref_ax.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tr), ref_tr.numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# NYU DenseNet-161 encoder: input-handling + architecture parity.
#
# torchvision is absent here, so we stub `torchvision.models.densenet161`
# with a from-scratch torch DenseNet-161 whose .features Sequential uses the
# exact torchvision child names (conv0/norm0/relu0/pool0, denseblockX.
# denselayerY.{norm1,conv1,norm2,conv2}, transitionX.{norm,conv,pool},
# norm5) — the names the reference's forward iterates
# (`densenet_encoder.py:31-33`) and its state_dict exposes.
# ---------------------------------------------------------------------------

class _TVDenseLayer(torch.nn.Module):
    def __init__(self, in_ch, growth=48, bn_size=4):
        super().__init__()
        self.norm1 = torch.nn.BatchNorm2d(in_ch)
        self.relu1 = torch.nn.ReLU(inplace=True)
        self.conv1 = torch.nn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
        self.norm2 = torch.nn.BatchNorm2d(bn_size * growth)
        self.relu2 = torch.nn.ReLU(inplace=True)
        self.conv2 = torch.nn.Conv2d(bn_size * growth, growth, 3, padding=1,
                                     bias=False)

    def forward(self, x):
        y = self.conv1(self.relu1(self.norm1(x)))
        y = self.conv2(self.relu2(self.norm2(y)))
        return torch.cat([x, y], 1)


class _TVDenseBlock(torch.nn.Module):
    def __init__(self, n, in_ch, growth=48, bn_size=4):
        super().__init__()
        for i in range(n):
            self.add_module(f"denselayer{i + 1}",
                            _TVDenseLayer(in_ch + i * growth, growth,
                                          bn_size))

    def forward(self, x):
        for child in self.children():
            x = child(x)
        return x


class _TVTransition(torch.nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.norm = torch.nn.BatchNorm2d(in_ch)
        self.relu = torch.nn.ReLU(inplace=True)
        self.conv = torch.nn.Conv2d(in_ch, out_ch, 1, bias=False)
        self.pool = torch.nn.AvgPool2d(2, 2)

    def forward(self, x):
        return self.pool(self.conv(self.relu(self.norm(x))))


def _tv_densenet161(pretrained=False):
    import collections
    growth, init_feats, bn_size = 48, 96, 4
    blocks = (6, 12, 36, 24)
    layers = collections.OrderedDict([
        ("conv0", torch.nn.Conv2d(3, init_feats, 7, 2, 3, bias=False)),
        ("norm0", torch.nn.BatchNorm2d(init_feats)),
        ("relu0", torch.nn.ReLU(inplace=True)),
        ("pool0", torch.nn.MaxPool2d(3, 2, 1)),
    ])
    nch = init_feats
    for bi, n in enumerate(blocks):
        layers[f"denseblock{bi + 1}"] = _TVDenseBlock(n, nch, growth,
                                                      bn_size)
        nch += n * growth
        if bi != len(blocks) - 1:
            layers[f"transition{bi + 1}"] = _TVTransition(nch, nch // 2)
            nch //= 2
    layers["norm5"] = torch.nn.BatchNorm2d(nch)
    model = torch.nn.Module()
    model.features = torch.nn.Sequential(layers)
    return model


@pytest.fixture(scope="module")
def ref_nyu_encoder_cls():
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    for name in ("densenet161", "densenet121", "densenet201", "densenet169"):
        setattr(tv_models, name, _tv_densenet161)
    tv.models = tv_models
    saved = {k: sys.modules.get(k) for k in ("torchvision",
                                             "torchvision.models")}
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    try:
        mod = _load_by_path(
            "ref_nyu_densenet_encoder",
            f"{REF_NYU}/networks/encoders/densenet_encoder.py")
        yield mod.DenseEncoder
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        sys.modules.pop("ref_nyu_densenet_encoder", None)


def _randomized_encoder(cls, seed):
    """Reference DenseEncoder with randomized weights AND BN stats (default
    running stats are (0, 1) which would hide normalization bugs)."""
    torch.manual_seed(seed)
    ref = cls(normalize_input=True, pretrained=False)
    g = torch.Generator().manual_seed(seed + 1)
    sd = ref.state_dict()
    for k, v in sd.items():
        if not torch.is_floating_point(v):
            continue
        r = 0.05 * torch.randn(v.shape, generator=g)
        sd[k] = r.abs() + 0.5 if k.endswith("running_var") else r
    ref.load_state_dict(sd)
    ref.eval()
    return ref


def test_nyu_densenet_encoder_normalize_is_noop(ref_nyu_encoder_cls):
    """The reference's normalize_input flag must not change its output:
    `t.sub(m).div(s)` is out-of-place with the result discarded
    (`densenet_encoder.py:27-29`). This locks the behavior our
    normalize_input=False default reproduces."""
    ref = _randomized_encoder(ref_nyu_encoder_cls, 20)
    g = torch.Generator().manual_seed(21)
    x = torch.rand(1, 3, 64, 96, generator=g)
    x0 = x.clone()        # pristine copy BEFORE any forward
    with torch.no_grad():
        out_on = ref(x)   # pass x itself so in-place mutation would show
        ref.normalize_input = False
        out_off = ref(x)
    for a, b in zip(out_on, out_off):
        assert torch.equal(a, b)
    # and the input itself was not mutated in place either
    assert torch.equal(x, x0)


def test_nyu_densenet_encoder_parity(ref_nyu_encoder_cls):
    """Full-forward parity: reference DenseEncoder (normalize_input=True,
    its constructor default) == our DenseNet161Encoder at OUR default
    (normalize_input=False) with imported weights — proving both the
    architecture mapping and that our default reproduces the reference's
    effective (unnormalized) input handling."""
    ref = _randomized_encoder(ref_nyu_encoder_cls, 22)
    g = torch.Generator().manual_seed(23)
    x = torch.rand(1, 3, 64, 96, generator=g)
    with torch.no_grad():
        ref_feats = ref(x)

    from wavelet_monodepth_tpu.models.densenet import DenseNet161Encoder
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = ti.import_densenet_encoder(
        sd, prefix="original_model.features.")
    ours = DenseNet161Encoder()          # default normalize_input=False
    feats = ours.apply(variables, jnp.asarray(_nhwc(x)), train=False)
    assert len(feats) == len(ref_feats) == 5
    for i, (got, want) in enumerate(zip(feats, ref_feats)):
        _assert_close(got, want, f"densenet_feat{i}", atol=2e-4)


# ---------------------------------------------------------------------------
# KITTI ResNet encoder: input normalization + architecture parity against
# `KITTI/networks/encoders/resnet_encoder.py:65-98` (its (x-0.45)/0.225 at
# :89 and the ResNetMultiImageInput rebuild at :17-59).
#
# torchvision is absent here, so `torchvision.models` is stubbed with a
# from-scratch torch ResNet using the exact torchvision child names
# (conv1/bn1/relu/maxpool/layer1..4, BasicBlock conv1/bn1/conv2/bn2/
# downsample.{0,1}, Bottleneck conv1..3/bn1..3) and torchvision's
# `_make_layer` semantics — the names the reference's forward drives and
# its state_dict exposes.
# ---------------------------------------------------------------------------

class _TVBasicBlock(torch.nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(inplanes, planes, 3, stride, 1,
                                     bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.relu = torch.nn.ReLU(inplace=True)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + identity)


class _TVBottleneck(torch.nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        # stride on the 3x3: torchvision resnet v1.5
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride, 1,
                                     bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(planes * 4)
        self.relu = torch.nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + identity)


class _TVResNet(torch.nn.Module):
    def __init__(self, block, layers, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU(inplace=True)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = torch.nn.AdaptiveAvgPool2d((1, 1))
        self.fc = torch.nn.Linear(512 * block.expansion, num_classes)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = torch.nn.Sequential(
                torch.nn.Conv2d(self.inplanes, planes * block.expansion,
                                1, stride, bias=False),
                torch.nn.BatchNorm2d(planes * block.expansion))
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes))
        return torch.nn.Sequential(*layers)


def _tv_resnet18(pretrained=False):
    assert not pretrained
    return _TVResNet(_TVBasicBlock, [2, 2, 2, 2])


def _tv_resnet50(pretrained=False):
    assert not pretrained
    return _TVResNet(_TVBottleneck, [3, 4, 6, 3])


@pytest.fixture(scope="module")
def ref_kitti_resnet_encoder_cls():
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_resnet = types.ModuleType("torchvision.models.resnet")
    tv_resnet.BasicBlock = _TVBasicBlock
    tv_resnet.Bottleneck = _TVBottleneck
    tv_resnet.model_urls = {}
    tv_models.resnet = tv_resnet
    tv_models.ResNet = _TVResNet
    tv_models.resnet18 = _tv_resnet18
    tv_models.resnet50 = _tv_resnet50
    for name in ("resnet34", "resnet101", "resnet152"):
        setattr(tv_models, name, _tv_resnet18)   # present, unused
    tv.models = tv_models
    keys = ("torchvision", "torchvision.models",
            "torchvision.models.resnet")
    saved = {k: sys.modules.get(k) for k in keys}
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    sys.modules["torchvision.models.resnet"] = tv_resnet
    try:
        mod = _load_by_path(
            "ref_kitti_resnet_encoder",
            f"{REF_KITTI}/networks/encoders/resnet_encoder.py")
        yield mod.ResnetEncoder
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        sys.modules.pop("ref_kitti_resnet_encoder", None)


def _randomize_torch_state(ref: torch.nn.Module, seed: int):
    """Randomize weights AND BN running stats (defaults are (0,1) which
    would hide normalization/stat-mapping bugs)."""
    g = torch.Generator().manual_seed(seed)
    sd = ref.state_dict()
    for k, v in sd.items():
        if not torch.is_floating_point(v):
            continue
        r = 0.05 * torch.randn(v.shape, generator=g)
        sd[k] = r.abs() + 0.5 if k.endswith("running_var") else r
    ref.load_state_dict(sd)
    ref.eval()
    return ref


def _check_kitti_resnet_parity(ref_cls, num_layers, seed, atol):
    from wavelet_monodepth_tpu.models.resnet import ResnetEncoder

    torch.manual_seed(seed)
    ref = _randomize_torch_state(ref_cls(num_layers, pretrained=False),
                                 seed + 1)
    g = torch.Generator().manual_seed(seed + 2)
    x = torch.rand(2, 3, 64, 96, generator=g)    # [0,1] image range
    with torch.no_grad():
        ref_feats = ref(x)

    variables = ti.import_resnet_encoder(_sd_numpy(ref), num_layers)
    ours = ResnetEncoder(num_layers=num_layers)
    feats = ours.apply(variables, jnp.asarray(_nhwc(x)), train=False)
    assert len(feats) == len(ref_feats) == 5
    for i, (got, want) in enumerate(zip(feats, ref_feats)):
        _assert_close(got, want, f"r{num_layers}_feat{i}", atol=atol)


def test_kitti_resnet18_encoder_parity(ref_kitti_resnet_encoder_cls):
    """R18 full-forward parity, including the (x-0.45)/0.225 input
    normalization (`resnet_encoder.py:89`) which our eval path folds into
    the stem conv + BN affine (models/resnet.py) — this drives the folded
    branch against the reference's standalone normalize."""
    _check_kitti_resnet_parity(ref_kitti_resnet_encoder_cls, 18, 30,
                               atol=1e-4)


def test_kitti_resnet50_encoder_parity(ref_kitti_resnet_encoder_cls):
    """R50 (Bottleneck, v1.5 stride placement) full-forward parity."""
    _check_kitti_resnet_parity(ref_kitti_resnet_encoder_cls, 50, 32,
                               atol=2e-4)


def test_kitti_resnet_multiimage_encoder_parity(
        ref_kitti_resnet_encoder_cls):
    """Pose-encoder path: ResNetMultiImageInput with 2 stacked frames
    (`resnet_encoder.py:17-59`) vs our ResnetEncoder(num_input_images=2)
    on the same (directly imported, 6-channel-stem) weights."""
    from wavelet_monodepth_tpu.models.resnet import ResnetEncoder

    torch.manual_seed(34)
    ref = _randomize_torch_state(
        ref_kitti_resnet_encoder_cls(18, pretrained=False,
                                     num_input_images=2), 35)
    g = torch.Generator().manual_seed(36)
    x = torch.rand(2, 6, 64, 96, generator=g)
    with torch.no_grad():
        ref_feats = ref(x)

    variables = ti.import_resnet_encoder(_sd_numpy(ref), 18)
    ours = ResnetEncoder(num_layers=18, num_input_images=2)
    feats = ours.apply(variables, jnp.asarray(_nhwc(x)), train=False)
    for i, (got, want) in enumerate(zip(feats, ref_feats)):
        _assert_close(got, want, f"multiimage_feat{i}", atol=1e-4)


def test_kitti_mobilenetv2_encoder_parity():
    """`mobilenetv2_encoder.py:80-164` is self-contained torch (no
    torchvision import; pretrained=False never touches model_zoo), so the
    ACTUAL reference module runs unstubbed. Note its forward does NOT
    normalize the input (`:144-146`), unlike the resnet encoder — ours
    matches. Exercises the new import_mobilenetv2_encoder mapping."""
    from wavelet_monodepth_tpu.models.mobilenetv2 import MobileNetV2Encoder

    mod = _load_by_path(
        "ref_kitti_mobilenetv2_encoder",
        f"{REF_KITTI}/networks/encoders/mobilenetv2_encoder.py")
    torch.manual_seed(38)
    ref = _randomize_torch_state(
        mod.MobileNetV2Encoder(pretrained=False, use_last_layer=True), 39)
    g = torch.Generator().manual_seed(40)
    x = torch.rand(2, 3, 64, 96, generator=g)
    with torch.no_grad():
        ref_feats = ref(x)

    variables = ti.import_mobilenetv2_encoder(_sd_numpy(ref))
    ours = MobileNetV2Encoder(use_last_layer=True)
    feats = ours.apply(variables, jnp.asarray(_nhwc(x)), train=False)
    assert len(feats) == len(ref_feats) == 5
    assert [f.shape[-1] for f in feats] == [32, 24, 32, 64, 1280]
    for i, (got, want) in enumerate(zip(feats, ref_feats)):
        _assert_close(got, want, f"mbv2_feat{i}", atol=1e-4)

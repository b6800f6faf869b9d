import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelet_monodepth_tpu.models.densenet import (NUM_CH_ENC,
                                                   DenseNet161Encoder)
from wavelet_monodepth_tpu.models.mobilenetv2 import (MobileNetV2Encoder,
                                                      num_ch_enc as mb_chans)
from wavelet_monodepth_tpu.models.pose import PoseCNN, PoseDecoder
from wavelet_monodepth_tpu.models.resnet import ResnetEncoder, num_ch_enc

H, W = 64, 96


def _input(c=3, n=1, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(n, H, W, c),
                       jnp.float32)


def test_resnet50_pyramid():
    enc = ResnetEncoder(num_layers=50)
    x = _input()
    v = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(v, x)
    assert [f.shape[-1] for f in feats] == list(num_ch_enc(50))
    assert [f.shape[1] for f in feats] == [H // 2, H // 4, H // 8,
                                           H // 16, H // 32]


def test_resnet_multi_image_input():
    enc = ResnetEncoder(num_layers=18, num_input_images=2)
    x = _input(c=6)
    v = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(v, x)
    assert feats[-1].shape == (1, H // 32, W // 32, 512)


def test_resnet_stem_normalize_fold_exact_on_borders():
    """The folded inference stem must match normalize-then-conv everywhere.

    The fold's border correction is position-dependent (the reference
    zero-pads the *normalized* input), so compare against an unfolded
    model applied to a pre-normalized input — full map, borders included.
    """
    enc_fold = ResnetEncoder(num_layers=18, normalize_input=True)
    enc_plain = ResnetEncoder(num_layers=18, normalize_input=False)
    x = _input(seed=3)
    v = enc_fold.init(jax.random.PRNGKey(7), x)
    # Nontrivial running stats so the BN affine isn't the identity.
    bs = jax.tree.map(lambda a: a + 0.25, v["batch_stats"])
    v = {"params": v["params"], "batch_stats": bs}
    folded = enc_fold.apply(v, x)
    ref = enc_plain.apply(v, (x - 0.45) / 0.225)
    for f_got, f_ref in zip(folded, ref):
        np.testing.assert_allclose(np.asarray(f_got), np.asarray(f_ref),
                                   atol=1e-4, rtol=1e-4)


def test_resnet_batchnorm_train_mode():
    enc = ResnetEncoder(num_layers=18)
    x = _input()
    v = enc.init(jax.random.PRNGKey(0), x)
    feats, updates = enc.apply(v, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in updates
    assert feats[-1].shape == (1, H // 32, W // 32, 512)


@pytest.mark.parametrize("use_last", [True, False])
def test_mobilenet_pyramid(use_last):
    enc = MobileNetV2Encoder(use_last_layer=use_last)
    x = _input()
    v = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(v, x)
    assert [f.shape[-1] for f in feats] == list(mb_chans(use_last))
    assert [f.shape[1] for f in feats] == [H // 2, H // 4, H // 8,
                                           H // 16, H // 32]


def test_densenet_pyramid():
    enc = DenseNet161Encoder()
    x = _input()
    v = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(v, x)
    assert [f.shape[-1] for f in feats] == list(NUM_CH_ENC)
    assert [f.shape[1] for f in feats] == [H // 2, H // 4, H // 8,
                                           H // 16, H // 32]


def test_pose_decoder():
    feats = [jnp.asarray(np.random.RandomState(1).rand(2, 2, 3, 512),
                         jnp.float32)]
    dec = PoseDecoder(num_ch_enc=(64, 64, 128, 256, 512),
                      num_input_features=1, num_frames_to_predict_for=2)
    v = dec.init(jax.random.PRNGKey(0), [[feats[0]]])
    aa, t = dec.apply(v, [[feats[0]]])
    assert aa.shape == (2, 2, 1, 3) and t.shape == (2, 2, 1, 3)
    assert float(jnp.abs(aa).max()) < 1.0   # 0.01-scaled head


def test_pose_cnn():
    x = _input(c=6)
    net = PoseCNN(num_input_frames=2)
    v = net.init(jax.random.PRNGKey(0), x)
    aa, t = net.apply(v, x)
    assert aa.shape == (1, 1, 1, 3) and t.shape == (1, 1, 1, 3)

"""Network factory mirroring `KITTI/networks/network_constructors.py:12-64`
and the NYU `Model` dispatch (`NYUv2/model.py:12-71`)."""

from __future__ import annotations

from .decoders_kitti import DepthDecoder, KittiWaveletDecoder
from .decoders_nyu import (NyuDecoder, NyuDecoder224, NyuDecoderWave,
                           NyuDecoderWave224)
from .densenet import DenseNet161Encoder, NUM_CH_ENC as DENSENET_CH
from .mobilenetv2 import MobileNetV2Encoder, num_ch_enc as mobilenet_ch
from .pose import PoseCNN, PoseDecoder
from .resnet import ResnetEncoder, num_ch_enc as resnet_ch


def make_depth_encoder(opts):
    """`network_constructors.py:12-27`."""
    if opts.encoder_type == "resnet":
        return (ResnetEncoder(num_layers=opts.num_layers),
                resnet_ch(opts.num_layers))
    if opts.encoder_type == "mobilenet":
        return MobileNetV2Encoder(use_last_layer=True), mobilenet_ch(True)
    if opts.encoder_type == "mobilenet_light":
        return MobileNetV2Encoder(use_last_layer=False), mobilenet_ch(False)
    raise NotImplementedError(opts.encoder_type)


def make_depth_decoder(num_ch_enc, opts):
    """`network_constructors.py:30-40`. The sparse decoder is the wavelet
    decoder run with a threshold — one module, two modes."""
    if opts.use_wavelets:
        return KittiWaveletDecoder(num_ch_enc=tuple(num_ch_enc))
    return DepthDecoder(num_ch_enc=tuple(num_ch_enc),
                        scales=tuple(opts.scales))


def make_posenet(opts, num_pose_frames: int, num_input_frames: int):
    """`network_constructors.py:43-64`. Returns (pose_encoder or None,
    pose_decoder)."""
    if opts.pose_model_type == "separate_resnet":
        enc = ResnetEncoder(num_layers=opts.num_layers,
                            num_input_images=num_pose_frames)
        dec = PoseDecoder(num_ch_enc=resnet_ch(opts.num_layers),
                          num_input_features=1,
                          num_frames_to_predict_for=2)
        return enc, dec
    if opts.pose_model_type == "shared":
        dec = PoseDecoder(num_ch_enc=resnet_ch(opts.num_layers),
                          num_input_features=num_pose_frames)
        return None, dec
    if opts.pose_model_type == "posecnn":
        n = num_input_frames if opts.pose_model_input == "all" else 2
        return None, PoseCNN(num_input_frames=n)
    raise NotImplementedError(opts.pose_model_type)


def make_nyu_encoder(opts):
    """`NYUv2/model.py:19-29`."""
    if opts.encoder_type == "densenet":
        return (DenseNet161Encoder(normalize_input=opts.normalize_input),
                DENSENET_CH)
    if opts.encoder_type == "resnet":
        return (ResnetEncoder(num_layers=opts.num_layers,
                              normalize_input=opts.normalize_input),
                resnet_ch(opts.num_layers))
    if opts.encoder_type == "mobilenet":
        return MobileNetV2Encoder(use_last_layer=True), mobilenet_ch(True)
    if opts.encoder_type == "mobilenet_light":
        return MobileNetV2Encoder(use_last_layer=False), mobilenet_ch(False)
    raise NotImplementedError(opts.encoder_type)


def make_nyu_decoder(num_ch_enc, opts):
    """`NYUv2/model.py:37-64`; decoder_width fixed at 0.5 like the
    reference."""
    width = 0.5
    if opts.use_wavelets:
        if opts.use_sparse and opts.use_224:
            raise NotImplementedError
        cls = NyuDecoderWave224 if opts.use_224 else NyuDecoderWave
        return cls(num_ch_enc=tuple(num_ch_enc), decoder_width=width,
                   dw_waveconv=opts.dw_waveconv, dw_upconv=opts.dw_upconv)
    cls = NyuDecoder224 if opts.use_224 else NyuDecoder
    return cls(num_ch_enc=tuple(num_ch_enc), decoder_width=width,
               is_depthwise=(opts.dw_waveconv or opts.dw_upconv))

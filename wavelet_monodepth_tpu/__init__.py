"""wavelet_monodepth_tpu — a TPU-native reimplementation of WaveletMonoDepth.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
nianticlabs/wavelet-monodepth ("Single Image Depth Prediction with Wavelet
Decomposition", CVPR 2021): self-supervised stereo depth training on KITTI
(Depth-Hints lineage) and supervised depth training on NYUv2 (DenseDepth
lineage), both with wavelet decoders that predict sparse Haar coefficients
and reconstruct disparity by repeated inverse DWT, plus sparse inference
that skips compute below a coefficient threshold.

Design notes (TPU-first, not a port):
  * NHWC layouts everywhere; convs map onto the MXU via XLA.
  * Sparsity is expressed as static-shape masked compute: the exact
    semantics of the reference's gather/scatter engine (inactive sites
    contribute zero) are reproduced by masking inputs/outputs of dense
    convs, and real wall-clock wins come from Pallas kernels that skip
    whole tiles whose output mask is empty.
  * Data parallelism via jax.sharding.Mesh + NamedSharding (psum grads),
    not translated NCCL calls (the reference is single-GPU).

Package layout:
  ops/       pure-function primitives (wavelets, sparse conv, geometry, SSIM)
  models/    flax modules: encoders (ResNet/MobileNetV2/DenseNet161),
             decoders (dense, dense-wavelet, sparse-wavelet, pose nets)
  data/      host-side input pipelines (KITTI, NYUv2)
  train/     jitted train steps, losses, optimizers
  parallel/  mesh construction and sharded train-step wrappers
  eval/      eigen-split / NYU evaluators, metrics
  tools/     checkpoint import/export, CLIs
  utils/     config dataclasses, checkpointing, logging
"""

__version__ = "0.1.0"

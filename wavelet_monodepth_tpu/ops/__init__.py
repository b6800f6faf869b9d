from . import wavelets, image, geometry, ssim, metrics, sparse  # noqa: F401

from .image import psnr, psnr_per_image, ssim  # noqa: F401

from pgdvs_tpu.metrics.psnr_ssim import (  # noqa: F401
    masked_psnr,
    masked_ssim,
    quantize_uint8,
)

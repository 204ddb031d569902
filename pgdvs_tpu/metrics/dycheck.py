"""DyCheck (iPhone) metrics: mPSNR / mSSIM / mLPIPS with covisibility masks.

Numerically matches ``/root/reference/pgdvs/utils/dycheck/metrics.py``:

  * mPSNR: -10/ln10 * ln(masked mean squared error);
  * mSSIM: tf.image.ssim-style Gaussian-window SSIM (filter 11, sigma 1.5)
    where the blur is a *partial convolution* against the mask (Liu et al.
    ECCV'18) — masked pixels don't pollute window statistics;
  * mLPIPS: LPIPS on mask-multiplied images with spatial map masked-mean
    (delegates to metrics.lpips_jax with spatial=True).

All jnp, jittable; the evaluator runs them per image.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def masked_mean(x, mask=None):
    if mask is None:
        return jnp.mean(x)
    mask = jnp.broadcast_to(mask, x.shape)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1e-8)


def compute_psnr(img0, img1, mask=None):
    mse = (img0 - img1) ** 2
    return -10.0 / jnp.log(10.0) * jnp.log(masked_mean(mse, mask))


def compute_ssim(
    img0,
    img1,
    mask=None,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
):
    """Gaussian-window SSIM with partial-convolution masking."""
    if mask is None:
        mask = jnp.ones_like(img0[..., :1])
    m = mask[..., 0]

    hw = filter_size // 2
    shift = (2 * hw - filter_size + 1) / 2
    f_i = ((jnp.arange(filter_size) - hw + shift) / filter_sigma) ** 2
    filt = jnp.exp(-0.5 * f_i)
    filt = filt / jnp.sum(filt)

    def conv_valid(z, f2):
        """2D 'valid' correlation via conv_general_dilated."""
        return jax.lax.conv_general_dilated(
            z[None, :, :, None],
            f2[:, :, None, None],
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )[0, :, :, 0]

    def partial_blur(z, m2, f2):
        z_ = conv_valid(z * m2, f2)
        m_ = conv_valid(m2, jnp.ones_like(f2))
        norm = jnp.sum(jnp.ones_like(f2))
        out = jnp.where(m_ != 0, z_ * norm / m_, 0.0)
        return out, (m_ != 0).astype(z.dtype)

    def filt_fn(z, m2):
        # separable: rows then cols, per channel
        def per_channel(zc):
            z1, m1 = partial_blur(zc, m2, filt[None, :])
            z2, m_out = partial_blur(z1, m1, filt[:, None])
            return z2

        return jnp.stack([per_channel(z[..., c]) for c in range(z.shape[-1])], -1)

    mu0 = filt_fn(img0, m)
    mu1 = filt_fn(img1, m)
    mu00 = mu0 * mu0
    mu11 = mu1 * mu1
    mu01 = mu0 * mu1
    sigma00 = filt_fn(img0 ** 2, m) - mu00
    sigma11 = filt_fn(img1 ** 2, m) - mu11
    sigma01 = filt_fn(img0 * img1, m) - mu01

    sigma00 = jnp.maximum(0.0, sigma00)
    sigma11 = jnp.maximum(0.0, sigma11)
    sigma01 = jnp.sign(sigma01) * jnp.minimum(
        jnp.sqrt(sigma00 * sigma11), jnp.abs(sigma01)
    )

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    return jnp.mean(numer / denom)


def compute_lpips(lpips_params, img0, img1, mask=None):
    """Masked LPIPS on mask-multiplied images (DyCheck protocol)."""
    from pgdvs_tpu.metrics.lpips_jax import lpips_distance

    if mask is None:
        mask = jnp.ones_like(img0[..., :1])
    dmap = lpips_distance(
        lpips_params, img0 * mask, img1 * mask, spatial=True
    )  # [H, W, 1]
    return masked_mean(dmap, mask)

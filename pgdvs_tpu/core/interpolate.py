"""Image sampling (grid_sample equivalents) in pure jnp.

The reference mixes two torch ``grid_sample`` conventions:
  * ``align_corners=True`` with coordinates normalized by (w-1, h-1)
    (epipolar sampling — ``projector.py:249-270``). Round-tripping the
    normalization, this is plain bilinear interpolation at pixel coordinates
    with zero padding — ``bilinear_sample`` below.
  * default ``align_corners=False`` with coordinates normalized by (w, h)
    (dynamic-renderer depth/rgb lookup — ``pgdvs_renderer_dyn.py:341-356``).
    Round-tripped, that samples at (uv - 0.5) — callers subtract the half
    pixel explicitly and reuse the same primitives.

All samplers take images channel-last and coordinates as (x, y) pixel units,
are batched over arbitrary leading coordinate dims, and use gather-based
indexing that XLA lowers efficiently on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_pixels(img, ix, iy):
    """img: [H, W, C]; ix/iy: int32 [...] clipped indices -> [..., C]."""
    h, w = img.shape[0], img.shape[1]
    flat = img.reshape(h * w, -1)
    idx = iy * w + ix
    return jnp.take(flat, idx, axis=0)


def bilinear_sample(img, x, y, zero_pad: bool = True):
    """Bilinearly sample a channel-last image at float pixel coordinates.

    Matches torch ``F.grid_sample(mode='bilinear', padding_mode='zeros',
    align_corners=True)`` once the caller's coordinates are in pixel units:
    out-of-range taps contribute zeros (not clamped edge values).

    Args:
      img: [H, W, C].
      x, y: [...] float pixel coordinates.
      zero_pad: if False, edge-clamp instead of zero padding.

    Returns: [..., C].
    """
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    out = 0.0
    for xi, wxi in ((x0, wx0), (x1, wx1)):
        for yi, wyi in ((y0, wy0), (y1, wy1)):
            ix = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            iy = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            tap = _gather_pixels(img, ix, iy)
            wgt = wxi * wyi
            if zero_pad:
                valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
                wgt = jnp.where(valid, wgt, 0.0)
            out = out + tap * wgt[..., None].astype(img.dtype)
    return out


def nearest_sample(img, x, y):
    """Nearest-neighbor sample (torch nearest semantics: round-half-away
    handled as floor(x + 0.5) is NOT used; torch rounds to nearest even via
    ``round``; in practice reference coords never sit exactly on .5 so plain
    rounding suffices). Out-of-range coordinates are edge-clamped.
    """
    w = img.shape[1]
    h = img.shape[0]
    ix = jnp.clip(jnp.round(x), 0, w - 1).astype(jnp.int32)
    iy = jnp.clip(jnp.round(y), 0, h - 1).astype(jnp.int32)
    return _gather_pixels(img, ix, iy)


def backwarp(img, flow):
    """Backward-warp an image by a flow field.

    ``out[y, x] = img(x + flow_x, y + flow_y)`` with bilinear sampling and
    zero padding — equivalent to the reference's normalized-grid backwarp
    (``pgdvs_renderer_base.py:91-138``), which normalizes by (W-1, H-1)
    i.e. align_corners=True pixel units.

    Args:
      img: [H, W, C]; flow: [H, W, 2] (dx, dy).
    Returns: [H, W, C].
    """
    h, w = img.shape[0], img.shape[1]
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=flow.dtype), jnp.arange(w, dtype=flow.dtype), indexing="ij"
    )
    return bilinear_sample(img, gx + flow[..., 0], gy + flow[..., 1])


def resize_bilinear(img, out_h: int, out_w: int):
    """Bilinear resize with align_corners=True corner mapping (matches the
    reference's upconv interpolate — ``feature_network.py:176-179``)."""
    h, w = img.shape[0], img.shape[1]
    ys = jnp.linspace(0.0, h - 1.0, out_h)
    xs = jnp.linspace(0.0, w - 1.0, out_w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return bilinear_sample(img, gx, gy, zero_pad=False)

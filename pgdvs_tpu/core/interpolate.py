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

import jax
import jax.numpy as jnp


def _gather_pixels(img, ix, iy):
    """img: [H, W, C]; ix/iy: int32 [...] clipped indices -> [..., C]."""
    h, w = img.shape[0], img.shape[1]
    flat = img.reshape(h * w, -1)
    idx = iy * w + ix
    # callers pass pre-clipped indices; mode="clip" skips the OOB fill select
    return jnp.take(flat, idx, axis=0, mode="clip")


def gather_2x2(img, x0, y0):
    """Fetch the 2x2xC footprint at integer corner (x0, y0) in ONE gather.

    TPU note: gathers cost per *row*; fetching the whole bilinear footprint
    as a single (2, 2, C) patch via lax.gather slice_sizes is ~4x fewer
    gather rows than four independent pixel lookups — this is the hot
    memory op of the epipolar sampler. Out-of-range starts are clamped by
    gather's CLIP mode (callers zero out-of-range taps via weights).

    Args: img [H, W, C]; x0/y0 int32 [N]. Returns [N, 2, 2, C] (y-major).
    """
    n = x0.shape[0]
    c = img.shape[-1]
    idx = jnp.stack([y0, x0], axis=-1)  # [N, 2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    return jax.lax.gather(
        img,
        idx,
        dnums,
        slice_sizes=(2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )


def bilinear_sample(img, x, y, zero_pad: bool = True):
    """Bilinearly sample a channel-last image at float pixel coordinates.

    Matches torch ``F.grid_sample(mode='bilinear', padding_mode='zeros',
    align_corners=True)`` once the caller's coordinates are in pixel units:
    out-of-range taps contribute zeros (not clamped edge values).

    TPU note: two code paths. Wide-channel images use ONE lax.gather of the
    2x2xC footprint per point (fewer gather rows). Narrow images (C < 8)
    would blow up HBM through tile padding of the tiny trailing dims
    ([N, 2, 2, 3] pads 42x), so they take four fused row-taps instead.

    Args:
      img: [H, W, C].
      x, y: [...] float pixel coordinates.
      zero_pad: if False, edge-clamp instead of zero padding.

    Returns: [..., C].
    """
    if img.shape[-1] < 8:
        return _bilinear_sample_taps(img, x, y, zero_pad)
    h, w = img.shape[0], img.shape[1]
    if h < 2 or w < 2:
        # degenerate dims: edge-pad so the 2x2 patch gather is well-formed
        # (weights below still use the ORIGINAL h/w, so padded texels only
        # ever receive zero weight / clamp-consistent weight)
        img = jnp.pad(
            img, ((0, max(2 - h, 0)), (0, max(2 - w, 0)), (0, 0)), mode="edge"
        )
    shape = x.shape
    xf = x.reshape(-1)
    yf = y.reshape(-1)
    # patch start, clipped to [0, dim-2] (the window always covers every
    # in-range tap; gather CLIP mode enforces the same clamp)
    sx = jnp.clip(jnp.floor(xf), 0, max(w - 2, 0))
    sy = jnp.clip(jnp.floor(yf), 0, max(h - 2, 0))
    patch = gather_2x2(img, sx.astype(jnp.int32), sy.astype(jnp.int32))

    if zero_pad:
        # per-column weights from the column's true coordinate: out-of-range
        # taps get weight 0 automatically (|x - coord| >= 1)
        wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(xf - sx))
        wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(xf - (sx + 1.0)))
        wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(yf - sy))
        wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(yf - (sy + 1.0)))
    else:
        # edge-clamp: interpolate at the clamped coordinate
        fx = jnp.clip(xf, 0, w - 1.0) - sx
        fy = jnp.clip(yf, 0, h - 1.0) - sy
        wx0, wx1 = 1.0 - fx, fx
        wy0, wy1 = 1.0 - fy, fy

    wgt = jnp.stack(
        [wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1
    ).astype(img.dtype)  # [N, 4]
    out = jnp.einsum("npc,np->nc", patch.reshape(xf.shape[0], 4, -1), wgt)
    return out.reshape(shape + (img.shape[-1],))


def _bilinear_sample_taps(img, x, y, zero_pad: bool):
    """4 independent row-tap bilinear path (narrow-channel images)."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    out = 0.0
    for xi, wxi in ((x0, 1.0 - wx1), (x0 + 1.0, wx1)):
        for yi, wyi in ((y0, 1.0 - wy1), (y0 + 1.0, wy1)):
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


def resize_bilinear(img, out_h: int, out_w: int, align_corners: bool = True):
    """Bilinear resize matching torch F.interpolate corner mapping.

    align_corners=True: matches the reference's upconv interpolate
    (``feature_network.py:176-179``). align_corners=False: torch default
    half-pixel mapping src = (dst + 0.5) * in/out - 0.5 with edge clamping
    (used by e.g. the CoTracker predictor's video resize,
    ``cotracker/predictor.py:108-110``).
    """
    h, w = img.shape[0], img.shape[1]
    if align_corners:
        ys = jnp.linspace(0.0, h - 1.0, out_h)
        xs = jnp.linspace(0.0, w - 1.0, out_w)
    else:
        ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (h / out_h) - 0.5
        xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (w / out_w) - 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return bilinear_sample(img, gx, gy, zero_pad=False)

"""Z-buffered point splatting — TPU-native point cloud rasterizer.

Replaces pytorch3d ``PointsRasterizer`` + ``NormWeightedCompositor`` as used
by the reference to render dynamic / static point clouds
(``/root/reference/pgdvs/renderers/pgdvs_renderer_dyn.py:671-724``,
``st_geo_renderer.py:85-120``).

pytorch3d semantics: each point covers pixels within an NDC radius ``r``;
per pixel the ``points_per_pixel`` nearest-by-depth covering points are
composited with weights ``1 - d2/r^2`` normalized to sum to one.

TPU design (two scatter passes over static shapes, no per-pixel K lists):
  1. scatter-min point depth into a z-buffer over each point's pixel
     footprint;
  2. points within a relative depth band of the z-buffer front surface
     scatter-add ``w * color`` and ``w`` (w = 1 - d2/r^2), normalized at the
     end.

This composites *all* front-surface points instead of exactly K — a softer
(anti-aliased) variant of NormWeighted compositing that avoids per-pixel
top-K data structures, which do not map to TPU vector memory. The depth band
plays the role pytorch3d's K-nearest-by-depth selection plays in suppressing
occluded points.

Both passes are XLA scatters (sort + segment-reduce on TPU, deterministic).
The footprint loop is a static unroll of (2*ceil(r_px)+1)^2 taps.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from pgdvs_tpu.core import cameras

_FAR = 1e30


@functools.partial(
    jax.jit, static_argnames=("image_hw", "radius", "depth_band", "ndc_radius")
)
def rasterize_points(
    points,
    colors,
    flat_cam,
    image_hw,
    valid=None,
    radius: float = 0.01,
    depth_band: float = 0.01,
    ndc_radius: bool = True,
):
    """Render a (padded) colored point cloud into a target camera.

    Args:
      points: [N, 3] world points (N = static capacity).
      colors: [N, C] per-point features.
      flat_cam: [34] target camera.
      image_hw: (H, W) static python ints.
      valid: [N] bool mask for padded entries.
      radius: point radius. If ``ndc_radius``, in pytorch3d NDC units where
        the *shorter* image side spans [-1, 1] (so r_px = r * min(H,W) / 2);
        otherwise directly in pixels.
      depth_band: relative depth tolerance for front-surface membership.

    Returns:
      image: [H, W, C] composited features (0 where nothing splats).
      alpha: [H, W, 1] 1.0 where any point covered the pixel.
    """
    h, w = image_hw
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)

    r_px = radius * min(h, w) / 2.0 if ndc_radius else radius
    fp = max(math.ceil(r_px), 1)  # static footprint half-extent in pixels

    uv, z, in_front = cameras.project_points(points.astype(jnp.float32), flat_cam)
    ok = valid & in_front
    z = jnp.where(ok, z, _FAR)

    px = uv[:, 0]
    py = uv[:, 1]

    # pass 1: z-buffer via scatter-min over the footprint
    zbuf = jnp.full((h * w + 1,), _FAR, jnp.float32)
    taps = []
    cx = jnp.round(px).astype(jnp.int32)
    cy = jnp.round(py).astype(jnp.int32)
    for dy in range(-fp, fp + 1):
        for dx in range(-fp, fp + 1):
            xi = cx + dx
            yi = cy + dy
            d2 = (xi.astype(jnp.float32) - px) ** 2 + (
                yi.astype(jnp.float32) - py
            ) ** 2
            cover = ok & (d2 <= r_px * r_px) & (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = jnp.where(cover, yi * w + xi, h * w)
            taps.append((idx, d2, cover))
            zbuf = zbuf.at[idx].min(jnp.where(cover, z, _FAR), mode="drop")

    # pass 2: normalized weighted compositing of front-surface points
    num = jnp.zeros((h * w + 1, colors.shape[1]), jnp.float32)
    den = jnp.zeros((h * w + 1,), jnp.float32)
    cols = colors.astype(jnp.float32)
    for idx, d2, cover in taps:
        front = z <= zbuf[jnp.clip(idx, 0, h * w - 1)] * (1.0 + depth_band)
        wgt = jnp.where(cover & front, 1.0 - d2 / (r_px * r_px), 0.0)
        wgt = jnp.maximum(wgt, 0.0)
        num = num.at[idx].add(cols * wgt[:, None], mode="drop")
        den = den.at[idx].add(wgt, mode="drop")

    num = num[: h * w].reshape(h, w, -1)
    den = den[: h * w].reshape(h, w, 1)
    img = num / jnp.maximum(den, 1e-8)
    alpha = (den > 0.0).astype(jnp.float32)
    return img * alpha, alpha

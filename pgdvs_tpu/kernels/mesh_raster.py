"""Grid-mesh triangle rasterization — TPU-native.

Replaces pytorch3d ``MeshRasterizer`` + ``SimpleShader`` for the reference's
``dyn_render_type='mesh'`` ablation (``pgdvs_renderer_dyn.py:542-669``): the
dynamic pixels of a source frame form a pixel-grid mesh (two triangles per
pixel, vertices = the lifted 3D points), rendered into the target camera
with flat per-vertex colors and a z-buffer (faces_per_pixel=1).

TPU design: faces are a STATIC topology over the H x W vertex grid (2 per
pixel) with validity masks; each face rasterizes into a fixed window around
its projected centroid (grid-mesh triangles are small in the target view —
faces stretched beyond the window are dropped, which pytorch3d would also
cull at its bin size). Two scatter passes: z-min, then barycentric-shaded
color resolve at the front surface.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pgdvs_tpu.core import cameras

_FAR = 1e30


def grid_mesh_faces(h: int, w: int):
    """Static two-triangles-per-pixel topology over an [H, W] vertex grid.

    Face f of pixel (r, c): [(r,c), (r+1,c), (r+1,c+1)] and
    [(r,c), (r+1,c+1), (r,c+1)] (pgdvs_renderer_dyn.py:559-581); faces whose
    vertices fall off the grid are emitted with index 0 and must be masked
    by the caller using the returned in-bounds flag.
    """
    r, c = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    r = r.reshape(-1)
    c = c.reshape(-1)

    def vid(rr, cc):
        return rr * w + cc

    f1 = jnp.stack([vid(r, c), vid(r + 1, c), vid(r + 1, c + 1)], axis=-1)
    f2 = jnp.stack([vid(r, c), vid(r + 1, c + 1), vid(r, c + 1)], axis=-1)
    inb = (r + 1 < h) & (c + 1 < w)
    faces = jnp.concatenate([f1, f2], axis=0)
    face_ok = jnp.concatenate([inb, inb], axis=0)
    faces = jnp.where(face_ok[:, None], faces, 0)
    return faces, face_ok


@functools.partial(jax.jit, static_argnames=("image_hw", "window"))
def rasterize_grid_mesh(
    verts,
    colors,
    vert_valid,
    flat_cam,
    image_hw,
    window: int = 3,
    depth_band: float = 0.005,
):
    """Rasterize a pixel-grid mesh into a target camera.

    Args:
      verts: [H*W, 3] world vertices (one per source pixel).
      colors: [H*W, 3] vertex colors.
      vert_valid: [H*W] bool (dynamic & valid pixels).
      flat_cam: [34] target camera.
      image_hw: static (H, W) source grid == target image size.
      window: static half-extent of the per-face rasterization window.

    Returns: rgb [H, W, 3], mask [H, W, 1].
    """
    h, w = image_hw
    faces, face_grid_ok = grid_mesh_faces(h, w)  # [F, 3]
    f_valid = face_grid_ok & jnp.all(vert_valid[faces], axis=1)

    uv, z, in_front = cameras.project_points(verts, flat_cam)
    f_valid = f_valid & jnp.all(in_front[faces], axis=1)

    tri_uv = uv[faces]  # [F, 3, 2]
    tri_z = z[faces]  # [F, 3]
    tri_col = colors[faces]  # [F, 3, 3]

    center = jnp.mean(tri_uv, axis=1)  # [F, 2]
    cx = jnp.round(center[:, 0]).astype(jnp.int32)
    cy = jnp.round(center[:, 1]).astype(jnp.int32)

    # cull faces larger than the window (can't rasterize them fully)
    ext = jnp.max(jnp.abs(tri_uv - center[:, None, :]), axis=(1, 2))
    f_valid = f_valid & (ext <= window + 0.5)

    a = tri_uv[:, 0]
    b = tri_uv[:, 1]
    c = tri_uv[:, 2]
    det = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (c[:, 0] - a[:, 0]) * (
        b[:, 1] - a[:, 1]
    )
    det_ok = jnp.abs(det) > 1e-12
    det_safe = jnp.where(det_ok, det, 1.0)
    f_valid = f_valid & det_ok

    zbuf = jnp.full((h * w + 1,), _FAR, jnp.float32)
    taps = []
    for dy in range(-window, window + 1):
        for dx in range(-window, window + 1):
            px = cx + dx
            py = cy + dy
            fx = px.astype(jnp.float32)
            fy = py.astype(jnp.float32)
            w1 = (
                (b[:, 0] - fx) * (c[:, 1] - fy) - (c[:, 0] - fx) * (b[:, 1] - fy)
            ) / det_safe
            w2 = (
                (c[:, 0] - fx) * (a[:, 1] - fy) - (a[:, 0] - fx) * (c[:, 1] - fy)
            ) / det_safe
            w3 = 1.0 - w1 - w2
            inside = (w1 >= 0) & (w2 >= 0) & (w3 >= 0)
            pix_ok = (px >= 0) & (px < w) & (py >= 0) & (py < h)
            ok = f_valid & inside & pix_ok
            z_px = w1 * tri_z[:, 0] + w2 * tri_z[:, 1] + w3 * tri_z[:, 2]
            col_px = (
                w1[:, None] * tri_col[:, 0]
                + w2[:, None] * tri_col[:, 1]
                + w3[:, None] * tri_col[:, 2]
            )
            idx = jnp.where(ok, py * w + px, h * w)
            taps.append((idx, z_px, col_px, ok))
            zbuf = zbuf.at[idx].min(jnp.where(ok, z_px, _FAR), mode="drop")

    num = jnp.zeros((h * w + 1, 3), jnp.float32)
    den = jnp.zeros((h * w + 1,), jnp.float32)
    for idx, z_px, col_px, ok in taps:
        front = z_px <= zbuf[jnp.clip(idx, 0, h * w - 1)] * (1.0 + depth_band)
        wgt = (ok & front).astype(jnp.float32)
        num = num.at[idx].add(col_px * wgt[:, None], mode="drop")
        den = den.at[idx].add(wgt, mode="drop")

    num = num[: h * w].reshape(h, w, 3)
    den = den[: h * w].reshape(h, w, 1)
    rgb = num / jnp.maximum(den, 1e-8)
    mask = (den > 0).astype(jnp.float32)
    return rgb * mask, mask

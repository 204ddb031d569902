"""Camera contract and projection math.

The whole framework passes cameras around as a flat 34-vector
``[h, w, K.ravel()(16), c2w.ravel()(16)]`` — the same wire format the
reference uses (``/root/reference/pgdvs/renderers/pgdvs_renderer.py:354-357``),
so datasets written for the reference drop in unchanged.

All functions are pure jnp, shape-polymorphic over leading batch dims, and
safe to ``vmap``/``jit``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FLAT_CAM_DIM = 34

# Geometry matmuls must be exact float32: the default matmul precision on TPU
# (and this JAX build's CPU emulation) is bfloat16, whose ~3 decimal digits
# turn into multi-pixel projection error at fx ~ 300.
HIGHEST = jax.lax.Precision.HIGHEST


def make_flat_cam(h, w, intrinsics, c2w):
    """Pack image size + 4x4 intrinsics + 4x4 cam-to-world into a 34-vector."""
    intrinsics = jnp.asarray(intrinsics, jnp.float32).reshape(-1, 16)
    c2w = jnp.asarray(c2w, jnp.float32).reshape(-1, 16)
    hw = jnp.broadcast_to(
        jnp.asarray([h, w], jnp.float32), (intrinsics.shape[0], 2)
    )
    flat = jnp.concatenate([hw, intrinsics, c2w], axis=-1)
    return flat[0] if flat.shape[0] == 1 else flat


def flat_cam_hw(flat_cam):
    return flat_cam[..., 0], flat_cam[..., 1]


def flat_cam_intrinsics(flat_cam):
    """[..., 34] -> [..., 4, 4] intrinsics."""
    return flat_cam[..., 2:18].reshape(flat_cam.shape[:-1] + (4, 4))


def flat_cam_c2w(flat_cam):
    """[..., 34] -> [..., 4, 4] camera-to-world."""
    return flat_cam[..., 18:34].reshape(flat_cam.shape[:-1] + (4, 4))


def inverse_se3(mat4):
    """Closed-form inverse of a rigid 4x4 (rotation + translation).

    Cheaper and better-conditioned than a general solve; intrinsics in this
    codebase are inverted via `inverse_intrinsics` instead.
    """
    rot = mat4[..., :3, :3]
    t = mat4[..., :3, 3]
    rot_t = jnp.swapaxes(rot, -1, -2)
    t_new = -jnp.einsum("...ij,...j->...i", rot_t, t, precision=HIGHEST)
    out = jnp.zeros_like(mat4)
    out = out.at[..., :3, :3].set(rot_t)
    out = out.at[..., :3, 3].set(t_new)
    out = out.at[..., 3, 3].set(1.0)
    return out


def inverse_intrinsics3(k3):
    """Closed-form inverse of a 3x3 pinhole intrinsics matrix.

    Assumes the standard [[fx, s, cx], [0, fy, cy], [0, 0, 1]] layout.
    """
    fx = k3[..., 0, 0]
    s = k3[..., 0, 1]
    cx = k3[..., 0, 2]
    fy = k3[..., 1, 1]
    cy = k3[..., 1, 2]
    one = jnp.ones_like(fx)
    zero = jnp.zeros_like(fx)
    inv = jnp.stack(
        [
            jnp.stack([1.0 / fx, -s / (fx * fy), (s * cy - cx * fy) / (fx * fy)], -1),
            jnp.stack([zero, 1.0 / fy, -cy / fy], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        axis=-2,
    )
    return inv


def flat_cam_projection(flat_cam):
    """K @ w2c [4, 4] — the combined world->pixel matrix of project_points."""
    intr = flat_cam_intrinsics(flat_cam)
    c2w = flat_cam_c2w(flat_cam)
    return jnp.matmul(intr, inverse_se3(c2w), precision=HIGHEST)


def project_points(xyz, flat_cam, eps: float = 1e-8, clip: float = 1e6):
    """Project world points into a camera described by a flat 34-vector.

    Mirrors the reference projection semantics
    (``/root/reference/pgdvs/models/gnt/projector.py:41-73``): pixel = K @ w2c
    @ [xyz, 1]; uv = xy / clamp(z, eps); a point is valid iff z > 0.

    Args:
      xyz: [..., 3] world points.
      flat_cam: [34] flat camera.

    Returns:
      uv: [..., 2] pixel locations (x, y), clipped to +-clip.
      z: [...] depth in camera frame.
      in_front: [...] bool, True iff point is in front of the camera.
    """
    proj = flat_cam_projection(flat_cam)  # [4, 4]
    xyz_h = jnp.concatenate([xyz, jnp.ones_like(xyz[..., :1])], axis=-1)
    cam_pts = jnp.einsum("ij,...j->...i", proj, xyz_h, precision=HIGHEST)  # [..., 4]
    z = cam_pts[..., 2]
    uv = cam_pts[..., :2] / jnp.maximum(z[..., None], eps)
    uv = jnp.clip(uv, -clip, clip)
    return uv, z, z > 0


def pixel_inbound(uv, h, w):
    """True where uv = (x, y) lies inside [0, w-1] x [0, h-1].

    Matches ``projector.py:14-27`` (closed interval against w-1 / h-1).
    """
    return (
        (uv[..., 0] >= 0)
        & (uv[..., 0] <= w - 1.0)
        & (uv[..., 1] >= 0)
        & (uv[..., 1] <= h - 1.0)
    )


def get_rays(h: int, w: int, intrinsics, c2w, stride: int = 1):
    """Generate per-pixel camera rays.

    Matches the reference pixel convention (integer pixel centers, NO +0.5
    offset — ``pgdvs_renderer_base.py:27-44``).

    Args:
      h, w: full image size (static python ints).
      intrinsics: [4, 4] (only the upper-left 3x3 is used).
      c2w: [4, 4].
      stride: render stride; rays are generated on pixels ``[::stride]``.

    Returns:
      rays_o: [n, 3], rays_d: [n, 3] (unnormalized, z-depth parameterized),
      uv: [n, 2] pixel (x, y), render_hw: (rh, rw) python ints.
    """
    ys = jnp.arange(0, h, stride, dtype=jnp.float32)
    xs = jnp.arange(0, w, stride, dtype=jnp.float32)
    rh, rw = ys.shape[0], xs.shape[0]
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    u = grid_x.reshape(-1)
    v = grid_y.reshape(-1)
    pix = jnp.stack([u, v, jnp.ones_like(u)], axis=0)  # [3, n]
    k3 = jnp.asarray(intrinsics)[:3, :3]
    rot = jnp.asarray(c2w)[:3, :3]
    cam2pix = jnp.matmul(rot, inverse_intrinsics3(k3), precision=HIGHEST)
    rays_d = jnp.matmul(cam2pix, pix, precision=HIGHEST).T  # [n, 3]
    rays_o = jnp.broadcast_to(jnp.asarray(c2w)[:3, 3], rays_d.shape)
    uv = jnp.stack([u, v], axis=-1)
    return rays_o, rays_d, uv, (rh, rw)


def ray_diff_features(xyz, tgt_c2w, src_c2w, eps: float = 1e-6):
    """Per-(point, source-view) ray-difference feature.

    4 channels: unit direction of (dir_to_target_cam - dir_to_source_cam)
    and their dot product — the GNT view-attention positional encoding
    (``projector.py:75-115``).

    Args:
      xyz: [..., 3] world points.
      tgt_c2w: [4, 4] target camera-to-world.
      src_c2w: [..., 4, 4] or [4, 4] source camera-to-world (broadcastable).

    Returns:
      [..., 4].
    """
    to_tgt = tgt_c2w[:3, 3] - xyz
    to_src = src_c2w[..., :3, 3] - xyz
    to_tgt = to_tgt / (jnp.linalg.norm(to_tgt, axis=-1, keepdims=True) + eps)
    to_src = to_src / (jnp.linalg.norm(to_src, axis=-1, keepdims=True) + eps)
    diff = to_tgt - to_src
    diff_norm = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    dot = jnp.sum(to_tgt * to_src, axis=-1, keepdims=True)
    diff_dir = diff / jnp.maximum(diff_norm, eps)
    return jnp.concatenate([diff_dir, dot], axis=-1)

"""Pose / quaternion geometry.

Host-side (numpy) pose utilities used by the datasets and visualizer
trajectory machinery, plus jnp unprojection helpers used on device.

Functional equivalents of ``/root/reference/pgdvs/utils/geometry.py``
(quaternion slerp pose interpolation, qvec<->rotmat, pose recentering)
designed as stateless functions rather than a quaternion class.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# quaternion <-> rotation matrix (host-side numpy; wxyz convention)
# ---------------------------------------------------------------------------


def qvec_to_rotmat(qvec: np.ndarray) -> np.ndarray:
    """Unit quaternion [w, x, y, z] -> 3x3 rotation matrix."""
    w, x, y, z = qvec
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * z * x + 2 * w * y],
            [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
            [2 * z * x - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def rotmat_to_qvec(rot: np.ndarray) -> np.ndarray:
    """3x3 rotation matrix -> unit quaternion [w, x, y, z] with w >= 0.

    Uses the symmetric-eigenvector method (robust near 180-degree
    rotations), the same algorithm COLMAP and the reference use.
    """
    rxx, ryx, rzx, rxy, ryy, rzy, rxz, ryz, rzz = rot.flat
    k = (
        np.array(
            [
                [rxx - ryy - rzz, 0, 0, 0],
                [ryx + rxy, ryy - rxx - rzz, 0, 0],
                [rzx + rxz, rzy + ryz, rzz - rxx - ryy, 0],
                [ryz - rzy, rzx - rxz, rxy - ryx, rxx + ryy + rzz],
            ]
        )
        / 3.0
    )
    eigvals, eigvecs = np.linalg.eigh(k)
    qvec = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    if qvec[0] < 0:
        qvec *= -1
    return qvec


def quat_slerp(
    q0: np.ndarray, q1: np.ndarray, t: float, shortest: bool = True
) -> np.ndarray:
    """Spherical linear interpolation between unit quaternions ([w,x,y,z]).

    ``shortest=False`` reproduces the reference's ``interpolate``
    (``geometry.py:381-406``), which does NOT sign-flip antipodal pairs and
    so rotates the long way when the quaternion dot is negative (only
    reachable for consecutive poses more than 180 deg apart).
    """
    q0 = q0 / np.linalg.norm(q0)
    q1 = q1 / np.linalg.norm(q1)
    dot = float(np.dot(q0, q1))
    if shortest and dot < 0.0:  # take the short way around
        q1 = -q1
        dot = -dot
    if dot > 1.0 - 1e-9:  # nearly parallel: lerp + renormalize
        out = q0 + t * (q1 - q0)
        return out / np.linalg.norm(out)
    theta = np.arccos(np.clip(dot, -1.0, 1.0))
    s = np.sin(theta)
    return (np.sin((1.0 - t) * theta) * q0 + np.sin(t * theta) * q1) / s


def linear_pose_interp(
    trans_a: np.ndarray,
    rot_a: np.ndarray,
    trans_b: np.ndarray,
    rot_b: np.ndarray,
    t: float,
):
    """Interpolate between two rigid poses: lerp translation, slerp rotation.

    Same contract as the reference's ``linear_pose_interp``
    (``geometry.py:468-517``): returns (rot 3x3, translation 3). Matches it
    exactly, including the no-shortest-path slerp (A/B:
    tests/test_trajectory_ab.py).
    """
    q = quat_slerp(
        rotmat_to_qvec(rot_a), rotmat_to_qvec(rot_b), float(t),
        shortest=False,
    )
    trans = np.asarray(trans_a) + float(t) * (np.asarray(trans_b) - np.asarray(trans_a))
    return qvec_to_rotmat(q), trans


def interpolate_c2w(c2w_a: np.ndarray, c2w_b: np.ndarray, t: float) -> np.ndarray:
    """Slerp+lerp interpolation of two 4x4 camera-to-world matrices."""
    rot, trans = linear_pose_interp(c2w_a[:3, 3], c2w_a[:3, :3], c2w_b[:3, 3], c2w_b[:3, :3], t)
    out = np.eye(4, dtype=c2w_a.dtype)
    out[:3, :3] = rot
    out[:3, 3] = trans
    return out


# ---------------------------------------------------------------------------
# pose set helpers (host-side)
# ---------------------------------------------------------------------------


def average_pose(poses: np.ndarray) -> np.ndarray:
    """LLFF-style average camera pose of an [N, 3/4, 4] pose stack."""
    center = poses[:, :3, 3].mean(0)
    vec2 = _normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    return _view_matrix(vec2, up, center)


def recenter_poses(poses: np.ndarray) -> np.ndarray:
    """Recenter an [N, 4, 4] c2w stack so the average pose is the identity."""
    c2w = np.eye(4)
    c2w[:3, :4] = average_pose(poses)
    return np.linalg.inv(c2w) @ poses


def _normalize(x):
    return x / np.linalg.norm(x)


def _view_matrix(z, up, pos):
    vec2 = _normalize(z)
    vec0 = _normalize(np.cross(up, vec2))
    vec1 = _normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], axis=1)


def rotation_geodesic_dist(r_ref: np.ndarray, rs: np.ndarray) -> np.ndarray:
    """Angular distance between rotation matrices
    (``base.py:583-603`` batched_angular_dist_rot_matrix)."""
    tr = np.trace(np.einsum("nji,jk->nik", rs, r_ref), axis1=1, axis2=2)
    return np.arccos(np.clip((tr - 1.0) / 2.0, -1.0 + 1e-6, 1.0 - 1e-6))


def sort_poses_wrt_ref(
    ref_c2w: np.ndarray,
    c2ws: np.ndarray,
    metric: str = "dist",
    scene_center=(0.0, 0.0, 0.0),
    tgt_id: int = -1,
) -> np.ndarray:
    """Rank source cameras by closeness to a reference camera.

    The method set mirrors the reference's selection exactly
    (``/root/reference/pgdvs/datasets/base.py:413-474``):
      * ``dist``: camera-center euclidean distance;
      * ``vector``: angle between camera-center vectors around scene_center;
      * ``matrix``: rotation geodesic distance;
      * ``dist_matrix``: min-max-normalized sum of ``matrix`` and ``dist``.

    ``tgt_id >= 0`` excludes that index (pushed to the end). Returns indices
    of ``c2ws`` sorted most-similar first.
    """
    t_ref = ref_c2w[:3, 3]
    t = c2ws[:, :3, 3]
    if metric == "dist":
        d = np.linalg.norm(t - t_ref, axis=-1)
    elif metric == "vector":
        center = np.asarray(scene_center, np.float64)
        v_ref = t_ref - center
        v = t - center
        vu = v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-6)
        ru = v_ref / (np.linalg.norm(v_ref) + 1e-6)
        d = np.arccos(np.clip(vu @ ru, -1.0, 1.0))
    elif metric in ("matrix", "geodesic"):
        d = rotation_geodesic_dist(ref_c2w[:3, :3], c2ws[:, :3, :3])
    elif metric == "dist_matrix":
        d1 = rotation_geodesic_dist(ref_c2w[:3, :3], c2ws[:, :3, :3])
        d1 = (d1 - d1.min()) / (d1.max() - d1.min() + 1e-8)
        d2 = np.linalg.norm(t - t_ref, axis=-1)
        d2 = (d2 - d2.min()) / (d2.max() - d2.min() + 1e-8)
        d = d1 + d2
    else:
        raise ValueError(f"unknown metric {metric!r}")
    if tgt_id >= 0:
        d = d.copy()
        d[tgt_id] = 1e8
    return np.argsort(d)


# ---------------------------------------------------------------------------
# device-side (jnp) unprojection
# ---------------------------------------------------------------------------


def unproject_depth(depth, intrinsics, c2w):
    """Lift a [H, W] depth map to world points [H, W, 3].

    Uses the same z-depth ray parameterization as ray generation
    (point = o + d * depth with d unnormalized).
    """
    from pgdvs_tpu.core.cameras import get_rays

    h, w = depth.shape
    rays_o, rays_d, _, _ = get_rays(h, w, intrinsics, c2w)
    pts = rays_o + rays_d * depth.reshape(-1, 1)
    return pts.reshape(h, w, 3)


def uv_depth_to_world(uv, depth, intrinsics, c2w):
    """Lift pixel coordinates + depth to world points.

    Args:
      uv: [..., 2] pixel (x, y).
      depth: [...] z-depth.
      intrinsics: [4, 4]; c2w: [4, 4].
    Returns: [..., 3] world points.
    """
    from pgdvs_tpu.core.cameras import inverse_intrinsics3

    from pgdvs_tpu.core.cameras import HIGHEST

    ones = jnp.ones_like(uv[..., :1])
    pix = jnp.concatenate([uv, ones], axis=-1)  # [..., 3]
    k3_inv = inverse_intrinsics3(jnp.asarray(intrinsics)[:3, :3])
    rot = jnp.asarray(c2w)[:3, :3]
    mat = jnp.matmul(rot, k3_inv, precision=HIGHEST)
    dirs = jnp.einsum("ij,...j->...i", mat, pix, precision=HIGHEST)
    return jnp.asarray(c2w)[:3, 3] + dirs * depth[..., None]

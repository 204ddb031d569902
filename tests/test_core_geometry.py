"""Unit tests for core camera/geometry math.

Torch (CPU) is used purely as a numerical oracle for grid_sample / projection
conventions — the implementations under test are pure JAX.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pgdvs_tpu.core import cameras, geometry, interpolate, sampling


def _random_pose(rng):
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    c2w = np.eye(4)
    c2w[:3, :3] = q
    c2w[:3, 3] = rng.normal(size=3)
    return c2w


def _intrinsics(fx=320.0, fy=320.0, cx=160.0, cy=120.0):
    k = np.eye(4)
    k[0, 0], k[1, 1], k[0, 2], k[1, 2] = fx, fy, cx, cy
    return k


def test_flat_cam_roundtrip():
    rng = np.random.default_rng(0)
    k = _intrinsics()
    c2w = _random_pose(rng)
    flat = cameras.make_flat_cam(240, 320, k, c2w)
    assert flat.shape == (34,)
    h, w = cameras.flat_cam_hw(flat)
    assert float(h) == 240 and float(w) == 320
    np.testing.assert_allclose(cameras.flat_cam_intrinsics(flat), k, rtol=1e-6)
    np.testing.assert_allclose(cameras.flat_cam_c2w(flat), c2w, rtol=1e-6)


def test_inverse_se3_matches_linalg():
    rng = np.random.default_rng(1)
    c2w = _random_pose(rng)
    inv = np.asarray(cameras.inverse_se3(jnp.asarray(c2w, jnp.float32)))
    np.testing.assert_allclose(inv, np.linalg.inv(c2w), atol=1e-5)


def test_inverse_intrinsics3():
    k = _intrinsics(300.0, 310.0, 159.5, 119.5)[:3, :3]
    k[0, 1] = 2.0  # skew
    inv = np.asarray(cameras.inverse_intrinsics3(jnp.asarray(k, jnp.float32)))
    np.testing.assert_allclose(inv, np.linalg.inv(k), rtol=1e-5, atol=1e-7)


def test_project_unproject_roundtrip():
    """Rays generated for a pixel, pushed to depth d, must project back."""
    rng = np.random.default_rng(2)
    k = _intrinsics()
    c2w = _random_pose(rng)
    h, w = 48, 64
    rays_o, rays_d, uv, (rh, rw) = cameras.get_rays(h, w, k, c2w)
    assert (rh, rw) == (h, w)
    depth = rng.uniform(1.0, 5.0, size=(h * w, 1)).astype(np.float32)
    pts = rays_o + rays_d * depth
    flat = cameras.make_flat_cam(h, w, k, c2w)
    uv_proj, z, in_front = cameras.project_points(pts, flat)
    np.testing.assert_allclose(np.asarray(uv_proj), np.asarray(uv), atol=2e-2)
    np.testing.assert_allclose(np.asarray(z), depth[:, 0], rtol=1e-4)
    assert bool(jnp.all(in_front))


def test_project_points_matches_reference_formula():
    """Against a direct numpy transcription of projector.py:41-73 math."""
    rng = np.random.default_rng(3)
    k = _intrinsics()
    c2w = _random_pose(rng)
    xyz = rng.normal(size=(100, 3)).astype(np.float32) * 2.0
    flat = cameras.make_flat_cam(60, 80, k, c2w)
    uv, z, in_front = cameras.project_points(jnp.asarray(xyz), flat)

    proj = k @ np.linalg.inv(c2w)
    xyz_h = np.concatenate([xyz, np.ones((100, 1))], axis=1)
    ref = (proj @ xyz_h.T).T
    ref_uv = np.clip(ref[:, :2] / np.clip(ref[:, 2:3], 1e-8, None), -1e6, 1e6)
    # compare where the projection is well-conditioned (z positive, not tiny);
    # near-plane points blow up 1/z and only differ by f32 rounding
    stable = ref[:, 2] > 0.2
    assert stable.sum() > 20
    np.testing.assert_allclose(
        np.asarray(uv)[stable], ref_uv[stable], rtol=2e-3, atol=2e-2
    )
    np.testing.assert_array_equal(np.asarray(in_front), ref[:, 2] > 0)


def test_ray_diff_features_unit_and_dot():
    rng = np.random.default_rng(4)
    tgt = _random_pose(rng)
    src = _random_pose(rng)
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    feat = np.asarray(
        cameras.ray_diff_features(
            jnp.asarray(xyz), jnp.asarray(tgt, jnp.float32), jnp.asarray(src, jnp.float32)
        )
    )
    assert feat.shape == (50, 4)
    # first 3 channels are a unit vector (when diff is nonzero)
    norms = np.linalg.norm(feat[:, :3], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    assert np.all(np.abs(feat[:, 3]) <= 1.0 + 1e-5)


def test_quaternion_roundtrip():
    rng = np.random.default_rng(5)
    for _ in range(10):
        rot = _random_pose(rng)[:3, :3]
        q = geometry.rotmat_to_qvec(rot)
        np.testing.assert_allclose(geometry.qvec_to_rotmat(q), rot, atol=1e-8)


def test_slerp_endpoints_and_midpoint():
    rng = np.random.default_rng(6)
    a, b = _random_pose(rng), _random_pose(rng)
    np.testing.assert_allclose(geometry.interpolate_c2w(a, b, 0.0), a, atol=1e-7)
    np.testing.assert_allclose(geometry.interpolate_c2w(a, b, 1.0), b, atol=1e-7)
    mid = geometry.interpolate_c2w(a, b, 0.5)
    # midpoint rotation is equidistant from both endpoints (geodesic)
    def geo(r0, r1):
        tr = np.trace(r0[:3, :3].T @ r1[:3, :3])
        return np.arccos(np.clip((tr - 1) / 2, -1, 1))

    np.testing.assert_allclose(geo(mid, a), geo(mid, b), atol=1e-6)


def test_sort_poses_wrt_ref():
    rng = np.random.default_rng(7)
    ref = np.eye(4)
    c2ws = np.stack([np.eye(4)] * 5)
    for i in range(5):
        c2ws[i, :3, 3] = [i + 1.0, 0, 0]
    order = geometry.sort_poses_wrt_ref(ref, c2ws, metric="dist")
    np.testing.assert_array_equal(order, np.arange(5))


def test_unproject_depth_consistency():
    rng = np.random.default_rng(8)
    k = _intrinsics()
    c2w = _random_pose(rng)
    depth = rng.uniform(1.0, 3.0, size=(24, 32)).astype(np.float32)
    pts = geometry.unproject_depth(jnp.asarray(depth), k, c2w)
    flat = cameras.make_flat_cam(24, 32, k, c2w)
    uv, z, _ = cameras.project_points(pts.reshape(-1, 3), flat)
    gy, gx = np.meshgrid(np.arange(24), np.arange(32), indexing="ij")
    np.testing.assert_allclose(
        np.asarray(uv).reshape(24, 32, 2)[..., 0], gx, atol=3e-2
    )
    np.testing.assert_allclose(np.asarray(z).reshape(24, 32), depth, rtol=1e-4)


# ---------------------------------------------------------------------------
# grid_sample parity against torch (conventions oracle)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1])
def test_bilinear_sample_matches_torch_align_corners_true(seed):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(seed)
    h, w, c = 20, 30, 3
    img = rng.normal(size=(h, w, c)).astype(np.float32)
    # include out-of-range coords to exercise zero padding
    x = rng.uniform(-3, w + 2, size=(200,)).astype(np.float32)
    y = rng.uniform(-3, h + 2, size=(200,)).astype(np.float32)

    out = np.asarray(interpolate.bilinear_sample(jnp.asarray(img), x, y))

    gx = 2 * x / (w - 1.0) - 1.0
    gy = 2 * y / (h - 1.0) - 1.0
    grid = torch.tensor(np.stack([gx, gy], -1)[None, None])  # [1,1,200,2]
    t_img = torch.tensor(img).permute(2, 0, 1)[None]
    ref = (
        F.grid_sample(t_img, grid, mode="bilinear", padding_mode="zeros", align_corners=True)[
            0, :, 0, :
        ]
        .permute(1, 0)
        .numpy()
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_backwarp_identity_flow():
    rng = np.random.default_rng(9)
    img = rng.normal(size=(16, 20, 3)).astype(np.float32)
    out = np.asarray(interpolate.backwarp(jnp.asarray(img), jnp.zeros((16, 20, 2))))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_backwarp_shift():
    """Flow of (+1, 0) should fetch the pixel one to the right."""
    img = np.arange(5 * 7, dtype=np.float32).reshape(5, 7, 1)
    flow = np.zeros((5, 7, 2), np.float32)
    flow[..., 0] = 1.0
    out = np.asarray(interpolate.backwarp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out[:, :-1, 0], img[:, 1:, 0], atol=1e-6)
    np.testing.assert_allclose(out[:, -1, 0], 0.0, atol=1e-6)  # zero pad


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def test_sample_z_vals_uniform_and_inverse():
    near = jnp.asarray([1.0, 2.0])
    far = jnp.asarray([5.0, 10.0])
    z = np.asarray(sampling.sample_z_vals(near, far, 5, inv_uniform=False))
    np.testing.assert_allclose(z[0], [1, 2, 3, 4, 5], rtol=1e-6)
    z_inv = np.asarray(sampling.sample_z_vals(near, far, 5, inv_uniform=True))
    np.testing.assert_allclose(1.0 / z_inv[0], np.linspace(1.0, 0.2, 5), rtol=1e-6)
    assert np.all(np.diff(z_inv, axis=1) > 0)


def test_sample_pdf_matches_reference_loop():
    """Vectorized CDF inversion vs a literal numpy transcription of the
    reference's per-bin loop (ray_sampler.py:10-56)."""
    rng = np.random.default_rng(10)
    n_rays, m, n_s = 7, 12, 9
    bins = np.sort(rng.uniform(0, 10, size=(n_rays, m + 1)), axis=1).astype(np.float32)
    weights = rng.uniform(0, 1, size=(n_rays, m)).astype(np.float32)

    out = np.asarray(
        sampling.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), n_s, deterministic=True)
    )

    w = weights + 1e-5
    pdf = w / w.sum(axis=1, keepdims=True)
    cdf = np.cumsum(pdf, axis=1)
    cdf = np.concatenate([np.zeros((n_rays, 1), np.float32), cdf], axis=1)
    u = np.broadcast_to(np.linspace(0, 1, n_s, dtype=np.float32), (n_rays, n_s))
    above = np.zeros((n_rays, n_s), np.int64)
    for i in range(m):
        above += (u >= cdf[:, i : i + 1]).astype(np.int64)
    below = np.maximum(above - 1, 0)
    cdf_b = np.take_along_axis(cdf, below, 1)
    cdf_a = np.take_along_axis(cdf, above, 1)
    bins_b = np.take_along_axis(bins, below, 1)
    bins_a = np.take_along_axis(bins, above, 1)
    denom = cdf_a - cdf_b
    denom[denom < 1e-5] = 1.0
    t = (u - cdf_b) / denom
    ref = bins_b + t * (bins_a - bins_b)

    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sample_along_rays_shapes_and_bounds():
    rays_o = jnp.zeros((4, 3))
    rays_d = jnp.asarray(np.tile([0.0, 0.0, 1.0], (4, 1)), jnp.float32)
    dr = jnp.asarray(np.tile([1.0, 8.0], (4, 1)), jnp.float32)
    pts, z = sampling.sample_along_rays(rays_o, rays_d, dr, 16, inv_uniform=True)
    assert pts.shape == (4, 16, 3) and z.shape == (4, 16)
    np.testing.assert_allclose(np.asarray(z[:, 0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(z[:, -1]), 8.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pts[..., 2]), np.asarray(z), rtol=1e-6)


def test_sample_fine_merge_sorted():
    z = jnp.asarray(np.tile(np.linspace(1.0, 5.0, 8, dtype=np.float32), (3, 1)))
    w = jnp.asarray(np.ones((3, 8), np.float32))
    merged = np.asarray(sampling.sample_fine_z_vals(z, w, 8, inv_uniform=True))
    assert merged.shape == (3, 16)
    assert np.all(np.diff(merged, axis=1) >= 0)


def test_rotation_geodesic_dist_general_axes():
    """vs the reference formula trace(R2^T @ R1) (base.py:583-603), with
    rotations about DIFFERENT axes and a non-identity reference — the
    same-axis/identity case is invariant to the transpose bug this guards."""
    from scipy.spatial.transform import Rotation as _R  # noqa

    from pgdvs_tpu.core.geometry import rotation_geodesic_dist

    rng = np.random.default_rng(11)
    rs = _R.random(8, random_state=3).as_matrix()
    r_ref = _R.random(1, random_state=4).as_matrix()[0]
    got = rotation_geodesic_dist(r_ref, rs)
    tiny = 1e-6
    ref = np.arccos(
        np.clip(
            (np.trace(np.matmul(rs.transpose(0, 2, 1), r_ref[None]),
                      axis1=1, axis2=2) - 1) / 2.0,
            -1 + tiny, 1 - tiny,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-10)

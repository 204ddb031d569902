"""Fused Pallas GNT kernel vs the flax reference implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pgdvs_tpu.kernels.gnt_fused import flatten_gnt_params, gnt_fused_apply
from pgdvs_tpu.models.gnt.network import GNT, sinusoidal_embed


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    r, s, v, f = 16, 32, 5, 32
    gnt = GNT(netwidth=64, depth=8, in_feat_ch=f, dtype="bfloat16", ret_view_std=False)
    rgb_feat = jnp.asarray(rng.normal(size=(r, s, v, 3 + f)).astype(np.float32))
    ray_diff = jnp.asarray(rng.normal(size=(r, s, v, 4)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(r, s, v, 1)) > 0.2).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(r, s, 3)).astype(np.float32))
    ray_d = jnp.asarray(rng.normal(size=(r, 3)).astype(np.float32))
    params = gnt.init(jax.random.PRNGKey(0), rgb_feat, ray_diff, mask, pts, ray_d)
    return gnt, params, rgb_feat, ray_diff, mask, pts, ray_d


def test_flatten_params_count(setup):
    gnt, params, *_ = setup
    head, pair = flatten_gnt_params(params)
    from pgdvs_tpu.kernels.gnt_fused import PAIR_PATHS
    assert len(head) == 8
    assert len(pair) == len(PAIR_PATHS)
    # pair arrays carry the n_pairs leading dim (flax nn.scan layout)
    assert all(w.shape[0] == 4 for w in pair)


def test_fused_matches_flax(setup):
    gnt, params, rgb_feat, ray_diff, mask, pts, ray_d = setup

    ref = gnt.apply(params, rgb_feat, ray_diff, mask, pts, ray_d)

    viewdirs = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    view_code = sinusoidal_embed(viewdirs)
    pts_code = sinusoidal_embed(pts)

    out = gnt_fused_apply(
        params, rgb_feat, ray_diff, mask, pts_code, view_code,
        ray_block=8, interpret=True,
    )

    np.testing.assert_allclose(
        np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=0.05, rtol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(out["weights"]), np.asarray(ref["weights"]), atol=0.02
    )


def test_fused_all_invalid_rows_finite(setup):
    gnt, params, rgb_feat, ray_diff, mask, pts, ray_d = setup
    mask = mask.at[0].set(0.0)  # whole ray invalid in every view
    view_code = sinusoidal_embed(ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True))
    pts_code = sinusoidal_embed(pts)
    out = gnt_fused_apply(
        params, rgb_feat, ray_diff, mask, pts_code, view_code,
        ray_block=8, interpret=True,
    )
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert np.isfinite(np.asarray(out["weights"])).all()


def test_mono3_fold_ray_diff_matches(setup):
    """In-kernel ray-diff computation must match the precomputed input."""
    from pgdvs_tpu.core.cameras import ray_diff_features
    from pgdvs_tpu.kernels.gnt_fused_mono3 import gnt_fused_apply_mono3

    gnt, params, rgb_feat, _rd_unused, mask, pts, ray_d = setup
    rng = np.random.default_rng(3)
    r, s, v, _ = rgb_feat.shape

    # geometric ray_diff from actual cameras (not the random fixture one)
    tgt_c2w = np.eye(4, dtype=np.float32)
    tgt_c2w[:3, 3] = [0.1, -0.2, -2.0]
    src_c2ws = np.stack([np.eye(4, dtype=np.float32)] * v)
    src_c2ws[:, :3, 3] = rng.normal(0, 0.5, (v, 3)) + [0, 0, -2.0]
    rd = np.stack(
        [
            np.asarray(
                ray_diff_features(
                    jnp.asarray(pts), jnp.asarray(tgt_c2w), jnp.asarray(c)
                )
            )
            for c in src_c2ws
        ],
        axis=2,
    )  # [R, S, V, 4]

    viewdirs = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    pc, vc = sinusoidal_embed(pts), sinusoidal_embed(viewdirs)
    ref = gnt_fused_apply_mono3(
        params, rgb_feat, jnp.asarray(rd), mask, pc, vc,
        ray_block=8, interpret=True,
    )
    centers = np.concatenate(
        [tgt_c2w[None, :3, 3], src_c2ws[:, :3, 3]], axis=0
    )
    got = gnt_fused_apply_mono3(
        params, rgb_feat, None, mask, pc, vc,
        ray_block=8, interpret=True,
        pts=jnp.asarray(pts), cam_centers=jnp.asarray(centers),
    )
    np.testing.assert_allclose(
        np.asarray(got["rgb"]), np.asarray(ref["rgb"]), atol=0.02, rtol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(got["weights"]), np.asarray(ref["weights"]), atol=0.01
    )


def test_mono3_matches_flax(setup):
    """v3 (cross-block width folding) vs the flax reference."""
    from pgdvs_tpu.kernels.gnt_fused_mono3 import gnt_fused_apply_mono3

    gnt, params, rgb_feat, ray_diff, mask, pts, ray_d = setup
    ref = gnt.apply(params, rgb_feat, ray_diff, mask, pts, ray_d)
    viewdirs = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    out = gnt_fused_apply_mono3(
        params, rgb_feat, ray_diff, mask,
        sinusoidal_embed(pts), sinusoidal_embed(viewdirs),
        ray_block=8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=0.05, rtol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(out["weights"]), np.asarray(ref["weights"]), atol=0.02
    )


def test_mono_pre_packed_matches(setup):
    """mask=None + validity channel pre-packed into rgb_feat must match the
    separate rgb_feat/mask inputs exactly (same bf16 packing either way)."""
    from pgdvs_tpu.kernels.gnt_fused_mono3 import gnt_fused_apply_mono3 as fn

    gnt, params, rgb_feat, ray_diff, mask, pts, ray_d = setup
    viewdirs = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    pc, vc = sinusoidal_embed(pts), sinusoidal_embed(viewdirs)
    ref = fn(
        params, rgb_feat, ray_diff, mask, pc, vc, ray_block=8, interpret=True
    )
    packed = jnp.concatenate(
        [rgb_feat.astype(jnp.bfloat16), mask.astype(jnp.bfloat16)], axis=-1
    )
    got = fn(
        params, packed, ray_diff, None, pc, vc, ray_block=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got["rgb"]), np.asarray(ref["rgb"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["weights"]), np.asarray(ref["weights"]), atol=1e-5
    )


def test_mono3_separate_mask_matches_and_counts(setup):
    """separate_mask inputs must match the concat path exactly, and the
    in-kernel weighted valid-view count must match the XLA-side reduction
    (static_gnt.py inbound_cnt semantics with validity == inbound)."""
    from pgdvs_tpu.kernels.gnt_fused_mono3 import gnt_fused_apply_mono3

    gnt, params, rgb_feat, ray_diff, mask, pts, ray_d = setup
    viewdirs = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    pc, vc = sinusoidal_embed(pts), sinusoidal_embed(viewdirs)
    ref = gnt_fused_apply_mono3(
        params, rgb_feat, ray_diff, mask, pc, vc, ray_block=8, interpret=True
    )
    got = gnt_fused_apply_mono3(
        params, rgb_feat, ray_diff, mask, pc, vc, ray_block=8, interpret=True,
        separate_mask=True,
    )
    np.testing.assert_allclose(
        np.asarray(got["rgb"]), np.asarray(ref["rgb"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["weights"]), np.asarray(ref["weights"]), atol=1e-5
    )
    v = rgb_feat.shape[2]
    want_cnt = np.sum(
        np.asarray(ref["weights"])
        * np.sum(np.asarray(mask)[..., 0], axis=-1) / v,
        axis=-1,
    )
    np.testing.assert_allclose(
        np.asarray(got["inbound_cnt_raw"]), want_cnt, atol=1e-4
    )


def test_mono3_fold_pos_code_matches(setup):
    """In-kernel pts embedding (fold_pos_code, requires fold_ray_diff) must
    match the streamed pos_code path."""
    from pgdvs_tpu.core.cameras import ray_diff_features
    from pgdvs_tpu.kernels.gnt_fused_mono3 import gnt_fused_apply_mono3

    gnt, params, rgb_feat, _rd, mask, pts, ray_d = setup
    rng = np.random.default_rng(7)
    v = rgb_feat.shape[2]
    tgt_c2w = np.eye(4, dtype=np.float32)
    tgt_c2w[:3, 3] = [0.1, -0.2, -2.0]
    src_c2ws = np.stack([np.eye(4, dtype=np.float32)] * v)
    src_c2ws[:, :3, 3] = rng.normal(0, 0.5, (v, 3)) + [0, 0, -2.0]
    centers = jnp.asarray(
        np.concatenate([tgt_c2w[None, :3, 3], src_c2ws[:, :3, 3]], axis=0)
    )
    viewdirs = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    pc, vc = sinusoidal_embed(pts), sinusoidal_embed(viewdirs)
    common = dict(ray_block=8, interpret=True, pts=pts, cam_centers=centers)
    ref = gnt_fused_apply_mono3(
        params, rgb_feat, None, mask, pc, vc, **common
    )
    got = gnt_fused_apply_mono3(
        params, rgb_feat, None, mask, None, vc, fold_pos_code=True, **common
    )
    # bf16-ULP-scale differences: the recurrence compiles with different
    # FMA contraction inside the kernel vs the XLA-side embed
    np.testing.assert_allclose(
        np.asarray(got["rgb"]), np.asarray(ref["rgb"]), atol=0.01
    )
    np.testing.assert_allclose(
        np.asarray(got["weights"]), np.asarray(ref["weights"]), atol=0.005
    )


def test_mono3_fold_mask_matches_explicit_mask(setup):
    """In-kernel validity recompute (fold_mask_hw + proj_mats) must match the
    explicit-mask path when the mask is built by the same camera formulas
    (cameras.project_points + pixel_inbound)."""
    from pgdvs_tpu.core import cameras as cam_mod
    from pgdvs_tpu.kernels.gnt_fused_mono3 import gnt_fused_apply_mono3

    gnt, params, rgb_feat, _rd, _mask, _pts, ray_d = setup
    rng = np.random.default_rng(11)
    r, s, v, fc = rgb_feat.shape
    h, w = 20, 28
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 25.0
    k[0, 2], k[1, 2] = w / 2, h / 2
    cams = []
    for i in range(v):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.2 * i - 0.3, 0.1 * i, -0.2 * i]
        cams.append(np.asarray(cam_mod.make_flat_cam(h, w, k, c2w), np.float32))
    cams = jnp.asarray(np.stack(cams))
    # points spread so some project out of bounds / behind cameras
    pts = jnp.asarray(rng.normal(0, 1.2, (r, s, 3)).astype(np.float32) + [0, 0, 2.5])
    uv, z, in_front = jax.vmap(lambda c: cam_mod.project_points(pts, c))(cams)
    inb = cam_mod.pixel_inbound(uv, float(h), float(w))
    mask = jnp.moveaxis((inb & in_front).astype(jnp.float32), 0, 2)[..., None]
    assert 0.05 < float(jnp.mean(mask)) < 0.95, "test scene not discriminative"
    projs = jax.vmap(cam_mod.flat_cam_projection)(cams)
    centers = jnp.concatenate(
        [
            cam_mod.flat_cam_c2w(cams[0])[None, :3, 3],
            jax.vmap(cam_mod.flat_cam_c2w)(cams)[:, :3, 3],
        ],
        axis=0,
    )
    viewdirs = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    vc = sinusoidal_embed(viewdirs)
    common = dict(
        ray_block=8, interpret=True, pts=pts, cam_centers=centers,
        fold_pos_code=True,
    )
    ref = gnt_fused_apply_mono3(
        params, rgb_feat, None, mask, None, vc, separate_mask=True, **common
    )
    got = gnt_fused_apply_mono3(
        params, rgb_feat, None, None, None, vc,
        fold_mask_hw=(float(h), float(w)), proj_mats=projs, **common
    )
    np.testing.assert_allclose(
        np.asarray(got["rgb"]), np.asarray(ref["rgb"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["weights"]), np.asarray(ref["weights"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["inbound_cnt_raw"]),
        np.asarray(ref["inbound_cnt_raw"]),
        atol=1e-4,
    )


def test_mono3_all_invalid_rows_finite(setup):
    from pgdvs_tpu.kernels.gnt_fused_mono3 import gnt_fused_apply_mono3

    gnt, params, rgb_feat, ray_diff, mask, pts, ray_d = setup
    mask = mask.at[0].set(0.0)
    viewdirs = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    out = gnt_fused_apply_mono3(
        params, rgb_feat, ray_diff, mask,
        sinusoidal_embed(pts), sinusoidal_embed(viewdirs),
        ray_block=8, interpret=True,
    )
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert np.isfinite(np.asarray(out["weights"])).all()


@pytest.mark.parametrize("pkv", [True, False])
def test_mono4_matches_mono3_fold_mask(setup, pkv):
    """128-lane packed kernel vs mono3 on the full fold set (ray_diff +
    pos_code + mask all computed in-kernel from pts + cameras). mono4
    changes only lane layout, the ray-attention sample order
    (evens-then-odds, exact by permutation equivariance) and the composed
    attention bottleneck chain (wk/wq/p1 folded through attn_fc_0 offline,
    exact by linearity), so agreement is bf16-rounding bounded. Both
    precompute_kv modes are exercised (the per-block slices are a
    column-slice identity of the wide matmuls — ADVICE r3)."""
    from pgdvs_tpu.core import cameras as cam_mod
    from pgdvs_tpu.kernels.gnt_fused_mono3 import gnt_fused_apply_mono3
    from pgdvs_tpu.kernels.gnt_fused_mono4 import gnt_fused_apply_mono4

    gnt, params, rgb_feat, _rd, _mask, _pts, ray_d = setup
    rng = np.random.default_rng(13)
    r, s, v, fc = rgb_feat.shape
    h, w = 20, 28
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 25.0
    k[0, 2], k[1, 2] = w / 2, h / 2
    cams = []
    for i in range(v):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.2 * i - 0.3, 0.1 * i, -0.2 * i]
        cams.append(np.asarray(cam_mod.make_flat_cam(h, w, k, c2w), np.float32))
    cams = jnp.asarray(np.stack(cams))
    pts = jnp.asarray(
        rng.normal(0, 1.2, (r, s, 3)).astype(np.float32) + [0, 0, 2.5]
    )
    projs = jax.vmap(cam_mod.flat_cam_projection)(cams)
    centers = jnp.concatenate(
        [
            cam_mod.flat_cam_c2w(cams[0])[None, :3, 3],
            jax.vmap(cam_mod.flat_cam_c2w)(cams)[:, :3, 3],
        ],
        axis=0,
    )
    viewdirs = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    vc = sinusoidal_embed(viewdirs)
    rf_outer = jnp.moveaxis(rgb_feat, 2, 0)  # [V, R, S, C] views-outer

    ref = gnt_fused_apply_mono3(
        params, rf_outer, None, None, None, vc,
        ray_block=8, interpret=True, views_outer=True,
        pts=pts, cam_centers=centers, fold_pos_code=True,
        fold_mask_hw=(float(h), float(w)), proj_mats=projs,
    )
    got = gnt_fused_apply_mono4(
        params, rf_outer, pts, vc, centers, projs, (h, w),
        ray_block=8, interpret=True, precompute_kv=pkv,
    )
    np.testing.assert_allclose(
        np.asarray(got["rgb"]), np.asarray(ref["rgb"]), atol=0.02, rtol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(got["weights"]), np.asarray(ref["weights"]), atol=0.01
    )
    np.testing.assert_allclose(
        np.asarray(got["inbound_cnt_raw"]),
        np.asarray(ref["inbound_cnt_raw"]),
        atol=0.01,
    )


@pytest.mark.parametrize(
    "block_rays,n_pos,rb", [(4, 16, 8), (8, 24, 4), (8, 24, 8)]
)
def test_mono4_patch_rows_matches_prefolded(setup, block_rays, n_pos, rb):
    """patch_rows mode (raw patch rows + stencil coefs, combine in-kernel
    composed with rgbfeat_fc_0) must match the rgb_feat path fed the SAME
    combine done XLA-side. Exact by linearity up to bf16 rounding and the
    pairing change (half-split vs adjacent — layout-only). Covers both
    2x2 blocks (4 rays / 16-position rows) and 4x2 blocks (8 rays /
    24-position rows) — the latter at both ray_block=4 (two grid steps
    share one rows block) and ray_block=8 (both quads of one step share
    it; the in-kernel combine loops quads over the un-tiled block)."""
    from pgdvs_tpu.core import cameras as cam_mod
    from pgdvs_tpu.kernels.gnt_fused_mono4 import gnt_fused_apply_mono4

    gnt, params, rgb_feat, _rd, _mask, _pts, ray_d = setup
    rng = np.random.default_rng(29)
    r, s, v, fc = rgb_feat.shape
    h, w = 20, 28
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 25.0
    k[0, 2], k[1, 2] = w / 2, h / 2
    cams = []
    for i in range(v):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.2 * i - 0.3, 0.1 * i, -0.2 * i]
        cams.append(np.asarray(cam_mod.make_flat_cam(h, w, k, c2w), np.float32))
    cams = jnp.asarray(np.stack(cams))
    pts = jnp.asarray(
        rng.normal(0, 1.2, (r, s, 3)).astype(np.float32) + [0, 0, 2.5]
    )
    projs = jax.vmap(cam_mod.flat_cam_projection)(cams)
    centers = jnp.concatenate(
        [
            cam_mod.flat_cam_c2w(cams[0])[None, :3, 3],
            jax.vmap(cam_mod.flat_cam_c2w)(cams)[:, :3, 3],
        ],
        axis=0,
    )
    vc = sinusoidal_embed(ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True))

    nrb = r // block_rays  # gather row blocks
    nq = r // 4            # kernel grid-step ray quads
    rows = jnp.asarray(
        rng.normal(0, 0.5, (v, nrb, s, n_pos * fc)).astype(np.float32)
    ).astype(jnp.bfloat16)
    # random nonneg coefs summing <= 1 per tap (bilinear-like); grouped
    # per grid-step QUAD of rays regardless of the gather blocking
    coef = jnp.asarray(
        rng.dirichlet(np.ones(n_pos), (v, nq, 4, s)).astype(np.float32)
    ).astype(jnp.bfloat16)

    # XLA-side reference combine -> [v, r, s, c]: ray = qq*4 + t uses the
    # rows block qq * 4 // block_rays
    c = fc
    qper = block_rays // 4  # quads per rows block
    rows_q = jnp.repeat(rows, qper, axis=1)  # [v, nq, s, n_pos*c]
    comb = jnp.zeros((v, nq, 4, s, c), jnp.float32)
    for p in range(n_pos):
        comb = comb + (
            rows_q[:, :, None, :, p * c : (p + 1) * c].astype(jnp.float32)
            * coef[..., p : p + 1].astype(jnp.float32)
        )
    rgb_feat_ref = comb.reshape(v, r, s, c).astype(jnp.bfloat16)

    ref = gnt_fused_apply_mono4(
        params, rgb_feat_ref, pts, vc, centers, projs, (h, w),
        ray_block=rb, interpret=True,
    )
    got = gnt_fused_apply_mono4(
        params, None, pts, vc, centers, projs, (h, w),
        ray_block=rb, interpret=True,
        patch_rows=rows, patch_coef=coef,
    )
    np.testing.assert_allclose(
        np.asarray(got["rgb"]), np.asarray(ref["rgb"]), atol=0.02, rtol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(got["weights"]), np.asarray(ref["weights"]), atol=0.01
    )
    np.testing.assert_allclose(
        np.asarray(got["inbound_cnt_raw"]),
        np.asarray(ref["inbound_cnt_raw"]),
        atol=0.01,
    )


@pytest.mark.parametrize("s_odd", [24, 23])
def test_mono4_pads_odd_sample_counts(setup, s_odd):
    """Merged coarse+fine counts that aren't 16-multiples are PADDED and
    the pad tokens masked out of ray attention + pooling — the result must
    equal mono3 on the unpadded inputs (no silent fallback, VERDICT r3)."""
    from pgdvs_tpu.core import cameras as cam_mod
    from pgdvs_tpu.kernels.gnt_fused_mono3 import gnt_fused_apply_mono3
    from pgdvs_tpu.kernels.gnt_fused_mono4 import gnt_fused_apply_mono4

    gnt, params, rgb_feat_f, _rd, _mask, _pts, ray_d = setup
    rng = np.random.default_rng(31)
    r, _s, v, fc = rgb_feat_f.shape
    rgb_feat = jnp.asarray(
        rng.normal(size=(r, s_odd, v, fc)).astype(np.float32)
    )
    h, w = 20, 28
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 25.0
    k[0, 2], k[1, 2] = w / 2, h / 2
    cams = []
    for i in range(v):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.2 * i - 0.3, 0.1 * i, -0.2 * i]
        cams.append(np.asarray(cam_mod.make_flat_cam(h, w, k, c2w), np.float32))
    cams = jnp.asarray(np.stack(cams))
    pts = jnp.asarray(
        rng.normal(0, 1.2, (r, s_odd, 3)).astype(np.float32) + [0, 0, 2.5]
    )
    projs = jax.vmap(cam_mod.flat_cam_projection)(cams)
    centers = jnp.concatenate(
        [
            cam_mod.flat_cam_c2w(cams[0])[None, :3, 3],
            jax.vmap(cam_mod.flat_cam_c2w)(cams)[:, :3, 3],
        ],
        axis=0,
    )
    vc = sinusoidal_embed(ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True))
    rf_outer = jnp.moveaxis(rgb_feat, 2, 0)

    ref = gnt_fused_apply_mono3(
        params, rf_outer, None, None, None, vc,
        ray_block=8, interpret=True, views_outer=True,
        pts=pts, cam_centers=centers, fold_pos_code=True,
        fold_mask_hw=(float(h), float(w)), proj_mats=projs,
    )
    got = gnt_fused_apply_mono4(
        params, rf_outer, pts, vc, centers, projs, (h, w),
        ray_block=8, interpret=True,
    )
    assert got["weights"].shape == (r, s_odd)
    np.testing.assert_allclose(
        np.asarray(got["rgb"]), np.asarray(ref["rgb"]), atol=0.02, rtol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(got["weights"]), np.asarray(ref["weights"]), atol=0.01
    )
    np.testing.assert_allclose(
        np.asarray(got["inbound_cnt_raw"]),
        np.asarray(ref["inbound_cnt_raw"]),
        atol=0.01,
    )


def test_mono4_all_invalid_rows_finite(setup):
    """Rays whose samples are invalid in every view must stay finite."""
    from pgdvs_tpu.core import cameras as cam_mod
    from pgdvs_tpu.kernels.gnt_fused_mono4 import gnt_fused_apply_mono4

    gnt, params, rgb_feat, _rd, _mask, _pts, ray_d = setup
    r, s, v, fc = rgb_feat.shape
    h, w = 20, 28
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 25.0
    k[0, 2], k[1, 2] = w / 2, h / 2
    cams = []
    for i in range(v):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.2 * i - 0.3, 0.1 * i, -0.2 * i]
        cams.append(np.asarray(cam_mod.make_flat_cam(h, w, k, c2w), np.float32))
    cams = jnp.asarray(np.stack(cams))
    # all points far behind every camera -> zero valid views everywhere
    pts = jnp.full((r, s, 3), -50.0, jnp.float32)
    projs = jax.vmap(cam_mod.flat_cam_projection)(cams)
    centers = jnp.concatenate(
        [
            cam_mod.flat_cam_c2w(cams[0])[None, :3, 3],
            jax.vmap(cam_mod.flat_cam_c2w)(cams)[:, :3, 3],
        ],
        axis=0,
    )
    vc = sinusoidal_embed(ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True))
    out = gnt_fused_apply_mono4(
        params, jnp.moveaxis(rgb_feat, 2, 0), pts, vc, centers, projs, (h, w),
        ray_block=8, interpret=True,
    )
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert np.isfinite(np.asarray(out["weights"])).all()
    assert np.isfinite(np.asarray(out["inbound_cnt_raw"])).all()

"""Tests for GNT building blocks against torch oracles and invariants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pgdvs_tpu.models.gnt.network import (
    GNT,
    RayAttention,
    ViewAttention,
    masked_view_std,
    sinusoidal_embed,
)
from pgdvs_tpu.models.gnt.feature_net import InstanceNorm, ReflectConv, ResUNet


def test_sinusoidal_embed_channels_and_values():
    x = jnp.asarray([[0.5, -1.0, 2.0]])
    out = np.asarray(sinusoidal_embed(x, n_freqs=10, max_freq_log2=9.0))
    assert out.shape == (1, 3 + 3 * 2 * 10)
    np.testing.assert_allclose(out[0, :3], [0.5, -1.0, 2.0])
    np.testing.assert_allclose(out[0, 3:6], np.sin([0.5, -1.0, 2.0]), rtol=1e-5)
    np.testing.assert_allclose(out[0, 6:9], np.cos([0.5, -1.0, 2.0]), rtol=1e-5)


def _ref_masked_std(k, valid):
    """Numpy transcription of the reference's unique-invalid-count loop
    semantics (transformer_network.py:87-150)."""
    r, s, v, c = k.shape
    std = np.zeros((r, s, c), np.float32)
    nstd = np.zeros((r, s, c), np.float32)
    for i in range(r):
        for j in range(s):
            vm = valid[i, j, :, 0] > 0
            cnt = vm.sum()
            if cnt == 0:
                sub = k[i, j]  # all views (reference unmasks these rows)
            elif cnt == 1:
                continue  # zeros
            else:
                sub = k[i, j, vm]
            std[i, j] = sub.std(axis=0, ddof=1)
            nstd[i, j] = std[i, j] / (np.abs(sub).mean(axis=0) + 1e-6)
    return std, nstd


def test_masked_view_std_matches_reference_semantics():
    rng = np.random.default_rng(0)
    r, s, v, c = 3, 4, 5, 6
    k = rng.normal(size=(r, s, v, c)).astype(np.float32)
    valid = (rng.uniform(size=(r, s, v, 1)) > 0.4).astype(np.float32)
    valid[0, 0] = 0.0  # all-invalid row
    valid[0, 1] = 0.0
    valid[0, 1, 2] = 1.0  # exactly-one-valid row
    std, nstd = masked_view_std(jnp.asarray(k), jnp.asarray(valid))
    ref_std, ref_nstd = _ref_masked_std(k, valid)
    np.testing.assert_allclose(np.asarray(std), ref_std, atol=1e-4)
    np.testing.assert_allclose(np.asarray(nstd), ref_nstd, atol=1e-4)


def test_view_attention_mask_semantics():
    """Attention must ignore invalid views; all-invalid rows fall back to
    un-masked attention (finite outputs, weights sum to 1)."""
    rng = np.random.default_rng(1)
    r, s, v, c = 2, 3, 4, 16
    module = ViewAttention(dim=c)
    q = jnp.asarray(rng.normal(size=(r, s, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(r, s, v, c)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(r, s, v, 4)), jnp.float32)
    mask = np.ones((r, s, v, 1), np.float32)
    mask[0, 0, 1:] = 0.0  # only view 0 valid
    mask[1, 2, :] = 0.0  # all invalid
    params = module.init(jax.random.PRNGKey(0), q, k, pos, jnp.asarray(mask))
    x, attn, _, _ = module.apply(params, q, k, pos, jnp.asarray(mask))
    attn = np.asarray(attn)
    assert np.isfinite(np.asarray(x)).all()
    # masked views get zero attention
    np.testing.assert_allclose(attn[0, 0, 1:], 0.0, atol=1e-7)
    np.testing.assert_allclose(attn.sum(axis=2), 1.0, atol=1e-5)
    # all-invalid row attends over every view (no zeros forced)
    assert (attn[1, 2] > 0).all()


def test_ray_attention_matches_numpy_softmax():
    rng = np.random.default_rng(2)
    r, s, c, heads = 2, 5, 16, 4
    module = RayAttention(dim=c, n_heads=heads)
    x = jnp.asarray(rng.normal(size=(r, s, c)), jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x)
    out, weights = module.apply(params, x)

    p = params["params"]
    q = np.asarray(x) @ np.asarray(p["q_fc"]["kernel"])
    k = np.asarray(x) @ np.asarray(p["k_fc"]["kernel"])
    v = np.asarray(x) @ np.asarray(p["v_fc"]["kernel"])
    hd = c // heads

    def split(t):
        return t.reshape(r, s, heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    logits = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(hd)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    attn = e / e.sum(-1, keepdims=True)
    ref_out = (attn @ vh).transpose(0, 2, 1, 3).reshape(r, s, c)
    ref_out = ref_out @ np.asarray(p["out_fc"]["kernel"]) + np.asarray(
        p["out_fc"]["bias"]
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(weights), attn.mean(axis=1)[:, 0, :], atol=1e-3
    )


def test_gnt_forward_shapes_and_weight_normalization():
    rng = np.random.default_rng(3)
    r, s, v, f = 6, 8, 3, 32
    gnt = GNT(netwidth=64, depth=2, in_feat_ch=f)
    args = (
        jnp.asarray(rng.normal(size=(r, s, v, 3 + f)), jnp.float32),
        jnp.asarray(rng.normal(size=(r, s, v, 4)), jnp.float32),
        jnp.ones((r, s, v, 1)),
        jnp.asarray(rng.normal(size=(r, s, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(r, 3)), jnp.float32),
    )
    params = gnt.init(jax.random.PRNGKey(0), *args)
    out = jax.jit(gnt.apply)(params, *args)
    assert out["rgb"].shape == (r, 3)
    assert out["weights"].shape == (r, s)
    assert out["view_std"].shape == (r, s, 3)  # depth + 1 layers
    np.testing.assert_allclose(np.asarray(out["weights"]).sum(-1), 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# feature net primitives vs torch
# ---------------------------------------------------------------------------


def test_reflect_conv_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 9, 11, 3)).astype(np.float32)
    mod = ReflectConv(features=5, kernel=3, stride=2)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(mod.apply(params, jnp.asarray(x)))

    kernel = np.asarray(params["params"]["Conv_0"]["kernel"])  # [kh, kw, in, out]
    t_conv = torch.nn.Conv2d(3, 5, 3, stride=2, padding=1, padding_mode="reflect", bias=False)
    t_conv.weight.data = torch.tensor(kernel.transpose(3, 2, 0, 1))
    ref = t_conv(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_instance_norm_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 7, 8, 4)).astype(np.float32) * 3 + 1
    mod = InstanceNorm()
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(mod.apply(params, jnp.asarray(x)))
    t_norm = torch.nn.InstanceNorm2d(4, affine=True, track_running_stats=False)
    t_norm.weight.data.fill_(1.0)
    t_norm.bias.data.fill_(0.0)
    ref = t_norm(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_resunet_output_resolution():
    rng = np.random.default_rng(6)
    net = ResUNet(layers=(1, 1, 1), out_channels=8)
    x = jnp.asarray(rng.normal(size=(2, 32, 44, 3)), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(net.apply)(params, x)
    # 44 wide: encoder 44->22->11->6->3, decoder 3->6->12 (odd extents round
    # up through the x2 upsample, same as the torch reference)
    assert out.shape == (2, 8, 12, 8)

    # odd sizes exercise the skip-connect padding
    x2 = jnp.asarray(rng.normal(size=(1, 37, 51, 3)), jnp.float32)
    out2 = jax.jit(net.apply)(params, x2)
    assert out2.shape[0] == 1 and out2.shape[-1] == 8


def test_fused_epipolar_close_to_exact():
    """Fused-map sampling must closely match reference-exact sampling
    (features double-interpolate; rgb and masks are exact)."""
    import jax
    from pgdvs_tpu.core import cameras as cam_mod
    from pgdvs_tpu.models.gnt.projector import (
        build_fused_maps,
        epipolar_sample,
        epipolar_sample_fused,
    )

    rng = np.random.default_rng(7)
    v, h, w, f = 3, 32, 40, 8
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 40.0
    k[0, 2], k[1, 2] = w / 2, h / 2
    cams = []
    for i in range(v):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.1 * i, -0.05 * i, 0.0]
        cams.append(np.asarray(cam_mod.make_flat_cam(h, w, k, c2w), np.float32))
    cams = jnp.asarray(np.stack(cams))
    tgt = cams[0]
    rgbs = jnp.asarray(rng.uniform(0, 1, (v, h, w, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(v, h // 4, w // 4, f)).astype(np.float32))
    masks = jnp.asarray((rng.uniform(size=(v, h, w, 1)) > 0.8).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(16, 8, 3)).astype(np.float32) * 0.5)
    pts = pts.at[..., 2].set(jnp.abs(pts[..., 2]) + 2.0)

    exact = epipolar_sample(pts, tgt, cams, rgbs, feats, masks)
    fused_maps = build_fused_maps(rgbs, feats, masks)
    fused = epipolar_sample_fused(pts, tgt, cams, fused_maps, with_mask=True)

    # rgb channels are exact; ray_diff identical; masks near-identical
    np.testing.assert_allclose(
        np.asarray(fused["rgb_feat"][..., :3]),
        np.asarray(exact["rgb_feat"][..., :3]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(fused["ray_diff"]), np.asarray(exact["ray_diff"]), atol=1e-6
    )
    # features: double interpolation stays close to direct quarter-res lookup
    err = np.abs(
        np.asarray(fused["rgb_feat"][..., 3:]) - np.asarray(exact["rgb_feat"][..., 3:])
    )
    scale = np.abs(np.asarray(exact["rgb_feat"][..., 3:])).mean()
    assert err.mean() < 0.2 * scale, (err.mean(), scale)
    agree = (
        np.asarray(fused["mask"]) == np.asarray(exact["mask"])
    ).mean()
    assert agree > 0.97


@pytest.mark.slow
def test_quad_epipolar_matches_fused():
    """Quad-map (1 gather row/tap) sampling must equal fused-map (4 taps)
    sampling bit-for-bit inside the image interior, and the views-outer
    layout must be the plain transpose of the default layout."""
    import jax
    from pgdvs_tpu.core import cameras as cam_mod
    from pgdvs_tpu.models.gnt.projector import (
        build_fused_maps,
        build_quad_maps,
        epipolar_sample_fused,
    )

    rng = np.random.default_rng(11)
    v, h, w, f = 3, 32, 40, 8
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 40.0
    k[0, 2], k[1, 2] = w / 2, h / 2
    cams = []
    for i in range(v):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.1 * i, -0.05 * i, 0.0]
        cams.append(np.asarray(cam_mod.make_flat_cam(h, w, k, c2w), np.float32))
    cams = jnp.asarray(np.stack(cams))
    tgt = cams[0]
    rgbs = jnp.asarray(rng.uniform(0, 1, (v, h, w, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(v, h // 4, w // 4, f)).astype(np.float32))
    masks = jnp.asarray((rng.uniform(size=(v, h, w, 1)) > 0.8).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(16, 8, 3)).astype(np.float32) * 0.5)
    pts = pts.at[..., 2].set(jnp.abs(pts[..., 2]) + 2.0)

    fmaps = build_fused_maps(rgbs, feats, masks)
    qmaps = build_quad_maps(rgbs, feats, masks)
    fused = epipolar_sample_fused(pts, tgt, cams, fmaps, with_mask=True)
    quad = epipolar_sample_fused(pts, tgt, cams, qmaps, with_mask=True, quad=True)

    # interior taps must agree to float rounding; border taps may differ
    # (edge-clamped quad stencil vs zero-pad) but are masked out anyway
    inb = np.asarray(fused["mask_inbound"])[..., 0] > 0
    for key in ("rgb_feat", "mask", "mask_invalid"):
        a, b = np.asarray(fused[key]), np.asarray(quad[key])
        np.testing.assert_allclose(a[inb], b[inb], atol=1e-5, err_msg=key)

    vo = epipolar_sample_fused(
        pts, tgt, cams, qmaps, with_mask=True, quad=True, views_outer=True
    )
    for key in ("rgb_feat", "ray_diff", "mask"):
        np.testing.assert_array_equal(
            np.moveaxis(np.asarray(vo[key]), 0, 2), np.asarray(quad[key]), err_msg=key
        )

    # raw-rows sampling (fold_lerp input): manual lerp of rows by the frac
    # weights must reproduce quad sampling exactly, masks identical
    from pgdvs_tpu.models.gnt.projector import epipolar_sample_quad_raw

    raw = epipolar_sample_quad_raw(pts, tgt, cams, qmaps)
    fr = np.asarray(raw["frac"], np.float32)
    rows = np.asarray(raw["rows"], np.float32)
    c = rows.shape[-1] // 4
    wx0 = np.maximum(0.0, 1.0 - np.abs(fr[..., 0:1]))
    wx1 = np.maximum(0.0, 1.0 - np.abs(fr[..., 0:1] - 1.0))
    wy0 = np.maximum(0.0, 1.0 - np.abs(fr[..., 1:2]))
    wy1 = np.maximum(0.0, 1.0 - np.abs(fr[..., 1:2] - 1.0))
    lerped = (
        rows[..., :c] * (wx0 * wy0)
        + rows[..., c : 2 * c] * (wx1 * wy0)
        + rows[..., 2 * c : 3 * c] * (wx0 * wy1)
        + rows[..., 3 * c :] * (wx1 * wy1)
    )
    np.testing.assert_allclose(
        lerped[..., :-1], np.asarray(vo["rgb_feat"]), atol=2e-2
    )
    # the trailing channel is the RAW lerped invalid-mask value; the fused
    # sampler thresholds it at 1e-3
    np.testing.assert_array_equal(
        lerped[..., -1:] > 1e-3, np.asarray(vo["mask_invalid"]) > 0
    )
    np.testing.assert_array_equal(
        np.asarray(raw["mask_inbound"]), np.asarray(vo["mask_inbound"])
    )

    # pack_mask: "packed" must be exactly concat(bf16 rgb_feat, bf16 mask)
    pk = epipolar_sample_fused(
        pts, tgt, cams, qmaps, with_mask=True, quad=True, views_outer=True,
        pack_mask=True,
    )
    assert "rgb_feat" not in pk and "mask" not in pk
    want = jnp.concatenate(
        [vo["rgb_feat"].astype(jnp.bfloat16), vo["mask"].astype(jnp.bfloat16)],
        axis=-1,
    )
    np.testing.assert_array_equal(np.asarray(pk["packed"]), np.asarray(want))


def test_patch_epipolar_matches_quad():
    """Patch-map sampling (one 4x4 row per 2x2 ray block) must reproduce
    quad-map sampling wherever the block's taps fit the patch — which for
    translation-only cameras (reprojection Jacobian == I, rig-like) is
    everywhere."""
    import jax
    from pgdvs_tpu.core import cameras as cam_mod
    from pgdvs_tpu.models.gnt.projector import (
        build_fused_maps,
        build_patch_maps,
        build_quad_maps,
        epipolar_sample_fused,
        epipolar_sample_patch,
        flatten_quad_maps,
    )

    rng = np.random.default_rng(17)
    v, h, w, f = 3, 32, 40, 8
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 40.0
    k[0, 2], k[1, 2] = w / 2, h / 2
    cams = []
    for i in range(v):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.1 * i - 0.1, -0.05 * i, 0.02 * i]
        cams.append(np.asarray(cam_mod.make_flat_cam(h, w, k, c2w), np.float32))
    cams = jnp.asarray(np.stack(cams))
    tgt_c2w = np.eye(4)
    tgt_c2w[:3, 3] = [0.013, 0.007, -0.031]
    tgt = jnp.asarray(cam_mod.make_flat_cam(h, w, k, tgt_c2w), jnp.float32)
    rgbs = jnp.asarray(rng.uniform(0, 1, (v, h, w, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(v, h // 4, w // 4, f)).astype(np.float32))

    # rays in 2x2 pixel blocks (the patch ray ordering), sampled along depth
    rays_o, rays_d, _uv, (rh, rw) = cam_mod.get_rays(
        h, w, cam_mod.flat_cam_intrinsics(tgt), cam_mod.flat_cam_c2w(tgt)
    )
    perm = (
        np.arange(rh * rw)
        .reshape(rh // 2, 2, rw // 2, 2)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )
    sel = perm[128:192]  # 16 blocks away from the top border
    s = 8
    z = jnp.linspace(1.5, 6.0, s)
    pts = (
        jnp.asarray(rays_o)[sel][:, None, :]
        + z[None, :, None] * jnp.asarray(rays_d)[sel][:, None, :]
    )

    qmaps = flatten_quad_maps(build_quad_maps(rgbs, feats, None))
    pmaps = build_patch_maps(rgbs, feats)
    quad = epipolar_sample_fused(
        pts, tgt, cams, qmaps, with_mask=False, quad=True, views_outer=True,
        with_ray_diff=False, emit_mask=False,
    )
    patch = epipolar_sample_patch(pts, tgt, cams, pmaps)
    np.testing.assert_allclose(
        np.asarray(patch["rgb_feat"], np.float32),
        np.asarray(quad["rgb_feat"], np.float32),
        atol=1e-5,
    )


@pytest.mark.slow
def test_render_rays_quad_views_outer_matches_exact_flax():
    """Full render_rays_gnt: quad+views_outer+pallas(interpret) path must
    match the exact-sampling flax path."""
    import jax
    from pgdvs_tpu.core import cameras as cam_mod
    from pgdvs_tpu.renderers.config import RenderConfig
    from pgdvs_tpu.renderers.static_gnt import (
        init_gnt_params,
        make_gnt_models,
        render_image_gnt,
    )

    rng = np.random.default_rng(3)
    v, h, w = 3, 24, 32
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 30.0
    k[0, 2], k[1, 2] = w / 2, h / 2
    cams = []
    for i in range(v):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.05 * i, 0.0, -0.1 * i]
        cams.append(np.asarray(cam_mod.make_flat_cam(h, w, k, c2w), np.float32))
    cams = jnp.asarray(np.stack(cams))
    # target camera offset from every source (like the real eval protocol,
    # which never puts the target frame among the sources): self-projection
    # would land uv EXACTLY on pixel-grid boundaries, where 1-ulp
    # differences between the XLA-side mask and the fold_mask in-kernel
    # recompute flip the border inbound bit
    tgt_c2w = np.eye(4)
    tgt_c2w[:3, 3] = [0.013, 0.007, -0.031]
    tgt_cam = jnp.asarray(
        cam_mod.make_flat_cam(h, w, k, tgt_c2w), jnp.float32
    )
    rgbs = jnp.asarray(rng.uniform(0, 1, (v, h, w, 3)).astype(np.float32))
    models = make_gnt_models(dtype="float32", ret_view_std=False)
    params = init_gnt_params(jax.random.PRNGKey(0), *models, n_src=v)
    depth_range = jnp.asarray([1.0, 6.0], jnp.float32)

    base = dict(n_coarse_samples_per_ray=16, ray_tile=256)
    cfg_exact = RenderConfig(
        **base, epipolar_mode="exact", use_pallas_gnt=False
    )
    cfg_fused = RenderConfig(
        **base, epipolar_mode="fused", use_pallas_gnt=True, pallas_ray_block=8
    )
    cfg_quad = RenderConfig(
        **base, epipolar_mode="quad", use_pallas_gnt=True, pallas_ray_block=8
    )
    # the bench configuration: mono3 kernel + in-kernel ray diff + separate
    # mask inputs + in-kernel inbound count
    cfg_bench = RenderConfig(
        **base, epipolar_mode="quad", use_pallas_gnt=True, pallas_ray_block=8,
        pallas_kernel="mono3", pallas_fold_ray_diff=True,
        pallas_fold_pos_code=True, pallas_fold_lerp=True,
    )

    def render(cfg):
        return jax.jit(
            lambda p: render_image_gnt(
                models, p, tgt_cam, cams, rgbs, (h, w), depth_range, cfg
            )
        )(params)

    # fold_mask: no mask operand — in-kernel inbound/in-front recompute
    cfg_bench_fm = RenderConfig(
        **base, epipolar_mode="quad", use_pallas_gnt=True, pallas_ray_block=8,
        pallas_kernel="mono3", pallas_fold_ray_diff=True,
        pallas_fold_pos_code=True, pallas_fold_mask=True,
    )
    # fold_lerp + fold_mask: raw quad rows + frac, validity in-kernel
    cfg_bench_lm = RenderConfig(
        **base, epipolar_mode="quad", use_pallas_gnt=True, pallas_ray_block=8,
        pallas_kernel="mono3", pallas_fold_ray_diff=True,
        pallas_fold_pos_code=True, pallas_fold_mask=True,
        pallas_fold_lerp=True,
    )

    # mono4: 128-lane sample-pair packing, full fold set
    cfg_bench_m4 = RenderConfig(
        **base, epipolar_mode="quad", use_pallas_gnt=True, pallas_ray_block=8,
        pallas_kernel="mono4", pallas_fold_ray_diff=True,
        pallas_fold_pos_code=True, pallas_fold_mask=True,
    )
    # patch: one 4x4 gather row per 2x2 ray block (the round-4 bench mode)
    cfg_bench_patch = RenderConfig(
        **base, epipolar_mode="patch", use_pallas_gnt=True,
        pallas_ray_block=4, pallas_kernel="mono4",
        pallas_fold_ray_diff=True, pallas_fold_pos_code=True,
        pallas_fold_mask=True,
    )
    # patch 4x2: one 6x4 gather row per 4x2 ray block (8x fewer rows)
    cfg_bench_patch42 = cfg_bench_patch.replace(pallas_patch_block="4x2")

    out_e, out_f, out_q = render(cfg_exact), render(cfg_fused), render(cfg_quad)
    out_b = render(cfg_bench)
    out_bfm = render(cfg_bench_fm)
    out_blm = render(cfg_bench_lm)
    out_bm4 = render(cfg_bench_m4)
    out_bp = render(cfg_bench_patch)
    out_bp42 = render(cfg_bench_patch42)
    # slightly looser rgb bound than quad-vs-fused: the in-kernel ray diff
    # rounds through bf16 at a different point than the XLA-side stream
    for key, tol in (("rgb", 0.04), ("depth", 0.1), ("inbound_cnt", 0.02)):
        np.testing.assert_allclose(
            np.asarray(out_b[key]), np.asarray(out_q[key]), atol=tol,
            err_msg=f"mono3 bench path: {key}",
        )
        np.testing.assert_allclose(
            np.asarray(out_bfm[key]), np.asarray(out_q[key]), atol=tol,
            err_msg=f"mono3 fold_mask path: {key}",
        )
        np.testing.assert_allclose(
            np.asarray(out_blm[key]), np.asarray(out_q[key]), atol=tol,
            err_msg=f"mono3 fold_lerp+fold_mask path: {key}",
        )
        np.testing.assert_allclose(
            np.asarray(out_bm4[key]), np.asarray(out_q[key]), atol=tol,
            err_msg=f"mono4 packed path: {key}",
        )
        np.testing.assert_allclose(
            np.asarray(out_bp[key]), np.asarray(out_q[key]), atol=tol,
            err_msg=f"patch-gather path: {key}",
        )
        np.testing.assert_allclose(
            np.asarray(out_bp42[key]), np.asarray(out_q[key]), atol=tol,
            err_msg=f"patch-gather 4x2 path: {key}",
        )
    # quad packs the same fused maps into the channel dim: vs the 4-tap
    # fused mode only float summation order differs (both bf16 kernels)
    np.testing.assert_allclose(
        np.asarray(out_q["rgb"]), np.asarray(out_f["rgb"]), atol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(out_q["depth"]), np.asarray(out_f["depth"]), atol=0.1
    )
    # vs exact sampling + f32 flax: differences stack (bf16 kernel,
    # pre-upsampled features) — bound loosely; with random untrained
    # weights the rgb head output spans ~[-2, 2]
    rgb_err = np.abs(np.asarray(out_q["rgb"]) - np.asarray(out_e["rgb"]))
    assert np.quantile(rgb_err, 0.99) < 0.1, np.quantile(rgb_err, 0.99)
    assert rgb_err.max() < 0.3, rgb_err.max()


def test_masked_perf_preset_matches_flax_on_same_sampler():
    """The masked-attention perf preset (mono3 + quad + ray-diff/pos-code
    folds + dyn mask — what `run.py benchmark --benchmark-type default`
    compiles since round 5) must match the flax path on the SAME quad
    sampler to bf16-kernel rounding (the 0.04 bound the other fold paths
    use). Guards the one preset output no pre-round-5 test covered:
    pallas folds composed WITH a dynamic mask."""
    import jax
    from pgdvs_tpu.core import cameras as cam_mod
    from pgdvs_tpu.renderers.config import RenderConfig, apply_perf_preset
    from pgdvs_tpu.renderers.static_gnt import (
        init_gnt_params,
        make_gnt_models,
        render_image_gnt,
    )

    rng = np.random.default_rng(3)
    v, h, w = 3, 16, 24
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 24.0
    k[0, 2], k[1, 2] = w / 2, h / 2
    cams = []
    for i in range(v):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.05 * i, 0.0, -0.02 * i]
        cams.append(np.asarray(cam_mod.make_flat_cam(h, w, k, c2w), np.float32))
    cams = jnp.asarray(np.stack(cams))
    tgt_c2w = np.eye(4)
    tgt_c2w[:3, 3] = [0.013, 0.007, -0.031]
    tgt_cam = jnp.asarray(cam_mod.make_flat_cam(h, w, k, tgt_c2w), jnp.float32)
    rgbs = jnp.asarray(rng.uniform(0, 1, (v, h, w, 3)).astype(np.float32))
    inv = jnp.asarray((rng.uniform(0, 1, (v, h, w, 1)) > 0.8).astype(np.float32))
    models = make_gnt_models(dtype="float32")
    params = init_gnt_params(jax.random.PRNGKey(0), *models, n_src=v)
    dr = jnp.asarray([1.0, 6.0], jnp.float32)

    base = dict(n_coarse_samples_per_ray=16, ray_tile=128, gnt_use_dyn_mask=True)
    cfg_fast = apply_perf_preset(RenderConfig(**base))
    assert cfg_fast.epipolar_mode == "quad"  # masks exclude patch/fold_mask
    assert cfg_fast.pallas_kernel == "mono3"

    def render(cfg):
        return jax.jit(
            lambda p: render_image_gnt(
                models, p, tgt_cam, cams, rgbs, (h, w), dr, cfg,
                src_invalid_masks=inv,
            )
        )(params)

    o_flax = render(RenderConfig(**base, epipolar_mode="quad",
                                 use_pallas_gnt=False))
    o_fast = render(cfg_fast)
    for key, tol in (("rgb", 0.04), ("depth", 0.1), ("dyn_cnt", 0.02),
                     ("inbound_cnt", 0.02)):
        np.testing.assert_allclose(
            np.asarray(o_fast[key]), np.asarray(o_flax[key]), atol=tol,
            err_msg=f"masked preset path: {key}",
        )


def test_patch_unserviceable_falls_back_to_quad_consistently():
    """A patch config that fails patch_ok must fall back to the quad path
    end to end (ADVICE r4, high): the pre-fix code only updated a local
    variable, so the map builder still keyed off cfg.epipolar_mode='patch'
    and crashed with an AttributeError inside epipolar_sample_fused."""
    import warnings

    import jax
    from pgdvs_tpu.core import cameras as cam_mod
    from pgdvs_tpu.renderers.config import RenderConfig
    from pgdvs_tpu.renderers.static_gnt import (
        init_gnt_params,
        make_gnt_models,
        render_image_gnt,
    )

    rng = np.random.default_rng(5)
    v, h, w = 2, 16, 24
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 24.0
    k[0, 2], k[1, 2] = w / 2, h / 2
    cams = []
    for i in range(v):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.05 * i, 0.0, -0.02 * i]
        cams.append(np.asarray(cam_mod.make_flat_cam(h, w, k, c2w), np.float32))
    cams = jnp.asarray(np.stack(cams))
    tgt_c2w = np.eye(4)
    tgt_c2w[:3, 3] = [0.013, 0.007, -0.031]
    tgt_cam = jnp.asarray(cam_mod.make_flat_cam(h, w, k, tgt_c2w), jnp.float32)
    rgbs = jnp.asarray(rng.uniform(0, 1, (v, h, w, 3)).astype(np.float32))
    models = make_gnt_models(dtype="float32")
    params = init_gnt_params(jax.random.PRNGKey(0), *models, n_src=v)
    dr = jnp.asarray([1.0, 6.0], jnp.float32)

    def render(cfg):
        return jax.jit(
            lambda p: render_image_gnt(
                models, p, tgt_cam, cams, rgbs, (h, w), dr, cfg
            )
        )(params)

    base = dict(n_coarse_samples_per_ray=8, ray_tile=128)
    # use_pallas_gnt=False fails patch_ok -> must warn and become quad
    with pytest.warns(UserWarning, match="falling back to 'quad'"):
        out_fb = render(
            RenderConfig(**base, epipolar_mode="patch", use_pallas_gnt=False)
        )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the explicit quad config is silent
        out_q = render(
            RenderConfig(**base, epipolar_mode="quad", use_pallas_gnt=False)
        )
    # after the fallback both configs run the IDENTICAL program
    for key in ("rgb", "depth", "inbound_cnt"):
        np.testing.assert_array_equal(
            np.asarray(out_fb[key]), np.asarray(out_q[key]), err_msg=key
        )


def test_patch_clamp_diagnostic_flags_scale_mismatched_rigs():
    """The patch sampler clamps taps whose stencil cell spreads past the
    gathered patch (a <=2 px sampling shift). patch_clamp_fraction makes a
    bad rig geometry detectable (ADVICE r4): ~0 for a rig-like camera set
    (and patch == quad there), clearly nonzero when a source view's pixel
    scale magnifies target blocks past the footprint (e.g. a zoomed-in
    source: 3x the target focal stretches a 2x2 block to ~6 px)."""
    from scipy.spatial.transform import Rotation

    from pgdvs_tpu.core import cameras as cam_mod
    from pgdvs_tpu.models.gnt.projector import (
        build_patch_maps,
        build_quad_maps,
        epipolar_sample_fused,
        epipolar_sample_patch,
        flatten_quad_maps,
        patch_clamp_fraction,
    )

    rng = np.random.default_rng(11)
    v, h, w, f = 3, 32, 40, 8
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 40.0
    k[0, 2], k[1, 2] = w / 2, h / 2

    def rig(rot_deg, focal=40.0):
        kk = np.eye(4)
        kk[0, 0] = kk[1, 1] = focal
        kk[0, 2], kk[1, 2] = w / 2, h / 2
        cams = []
        for i in range(v):
            c2w = np.eye(4)
            c2w[:3, :3] = Rotation.from_euler(
                "y", rot_deg * (i - 1), degrees=True
            ).as_matrix()
            c2w[:3, 3] = [0.1 * i - 0.1, -0.05 * i, 0.02 * i]
            cams.append(
                np.asarray(cam_mod.make_flat_cam(h, w, kk, c2w), np.float32)
            )
        return jnp.asarray(np.stack(cams))

    tgt_c2w = np.eye(4)
    tgt_c2w[:3, 3] = [0.013, 0.007, -0.031]
    tgt = jnp.asarray(cam_mod.make_flat_cam(h, w, k, tgt_c2w), jnp.float32)
    rgbs = jnp.asarray(rng.uniform(0, 1, (v, h, w, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(v, h // 4, w // 4, f)).astype(np.float32))
    pmaps = build_patch_maps(rgbs, feats)
    qmaps = flatten_quad_maps(build_quad_maps(rgbs, feats, None))

    rays_o, rays_d, _uv, (rh, rw) = cam_mod.get_rays(
        h, w, cam_mod.flat_cam_intrinsics(tgt), cam_mod.flat_cam_c2w(tgt)
    )
    perm = (
        np.arange(rh * rw)
        .reshape(rh // 2, 2, rw // 2, 2)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )
    sel = perm[128:384]
    s = 8
    z = jnp.linspace(1.5, 6.0, s)
    pts = (
        jnp.asarray(rays_o)[sel][:, None, :]
        + z[None, :, None] * jnp.asarray(rays_d)[sel][:, None, :]
    )

    # mild (rig-like) rotation: no clamping, patch == quad everywhere
    mild = rig(2.0)
    frac_mild = float(patch_clamp_fraction(pts, mild, pmaps))
    assert frac_mild < 0.01, frac_mild
    patch = epipolar_sample_patch(pts, tgt, mild, pmaps)
    quad = epipolar_sample_fused(
        pts, tgt, mild, qmaps, with_mask=False, quad=True, views_outer=True,
        with_ray_diff=False, emit_mask=False,
    )
    np.testing.assert_allclose(
        np.asarray(patch["rgb_feat"], np.float32),
        np.asarray(quad["rgb_feat"], np.float32),
        atol=1e-4,
    )

    # scale-mismatched rig (3x-zoomed source views): clearly flagged
    frac_hot = float(patch_clamp_fraction(pts, rig(2.0, focal=120.0), pmaps))
    assert frac_hot > frac_mild
    assert frac_hot > 0.02, frac_hot


@pytest.mark.slow
def test_render_with_fine_importance_resampling():
    """n_fine_samples_per_ray > 0 runs the second GNT pass on merged coarse
    + fine z values (reference gnt/renderer.py:290-412)."""
    import jax
    from pgdvs_tpu.core import cameras as cam_mod
    from pgdvs_tpu.renderers.config import RenderConfig
    from pgdvs_tpu.renderers.static_gnt import (
        init_gnt_params,
        make_gnt_models,
        render_image_gnt,
    )

    rng = np.random.default_rng(9)
    v, h, w = 2, 16, 24
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 24.0
    k[0, 2], k[1, 2] = w / 2, h / 2
    cams = jnp.asarray(
        np.stack(
            [
                np.asarray(cam_mod.make_flat_cam(h, w, k, np.eye(4)), np.float32)
                for _ in range(v)
            ]
        )
    )
    rgbs = jnp.asarray(rng.uniform(0, 1, (v, h, w, 3)).astype(np.float32))
    models = make_gnt_models(dtype="float32", ret_view_std=False)
    params = init_gnt_params(jax.random.PRNGKey(0), *models, n_src=v)
    dr = jnp.asarray([1.0, 6.0], jnp.float32)

    for use_pallas in (False, True):
        cfg = RenderConfig(
            n_coarse_samples_per_ray=8,
            n_fine_samples_per_ray=8,
            ray_tile=128,
            use_pallas_gnt=use_pallas,
            pallas_ray_block=8,
            epipolar_mode="quad" if use_pallas else "exact",
        )
        out = jax.jit(
            lambda p: render_image_gnt(
                models, p, cams[0], cams, rgbs, (h, w), dr, cfg
            )
        )(params)
        assert out["rgb"].shape == (h, w, 3)
        assert out["weights"].shape == (h, w, 16)  # coarse + fine
        assert np.isfinite(np.asarray(out["rgb"])).all()


def test_quad_i8_close_to_quad():
    """int8 quad maps must match bf16 quad sampling within the network's
    own bf16 activation precision."""
    from pgdvs_tpu.core import cameras as cam_mod
    from pgdvs_tpu.models.gnt.projector import (
        build_quad_maps,
        epipolar_sample_fused,
        quantize_quad_maps,
    )

    rng = np.random.default_rng(13)
    v, h, w, f = 3, 32, 40, 8
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 40.0
    k[0, 2], k[1, 2] = w / 2, h / 2
    cams = []
    for i in range(v):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.1 * i, -0.05 * i, 0.0]
        cams.append(np.asarray(cam_mod.make_flat_cam(h, w, k, c2w), np.float32))
    cams = jnp.asarray(np.stack(cams))
    rgbs = jnp.asarray(rng.uniform(0, 1, (v, h, w, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(v, h // 4, w // 4, f)).astype(np.float32))
    masks = jnp.asarray((rng.uniform(size=(v, h, w, 1)) > 0.8).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(16, 8, 3)).astype(np.float32) * 0.5)
    pts = pts.at[..., 2].set(jnp.abs(pts[..., 2]) + 2.0)

    qmaps = build_quad_maps(rgbs, feats, masks)
    q8, scales = quantize_quad_maps(qmaps)
    a = epipolar_sample_fused(pts, cams[0], cams, qmaps, with_mask=True, quad=True)
    b = epipolar_sample_fused(
        pts, cams[0], cams, q8, with_mask=True, quad=True, map_scales=scales
    )
    rf_a, rf_b = np.asarray(a["rgb_feat"]), np.asarray(b["rgb_feat"])
    scale_mag = np.abs(rf_a).max(axis=(0, 1, 2), keepdims=True) + 1e-6
    assert (np.abs(rf_a - rf_b) / scale_mag).max() < 0.03
    # the 0/1 mask channel quantizes exactly
    np.testing.assert_allclose(
        np.asarray(a["mask"]), np.asarray(b["mask"]), atol=1e-6
    )

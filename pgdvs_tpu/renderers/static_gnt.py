"""Static-background rendering with GNT — one fused XLA program.

Replaces the reference's host-side chunk loop
(``/root/reference/pgdvs/models/gnt/renderer.py:85-177``): instead of
launching ~77 GPU kernels per image and concatenating on host, the whole
render is a single jit — feature extraction once, then ``lax.map`` over
fixed-size ray tiles (sequential to bound VMEM/HBM working set, fused by
XLA within each tile). Rays are padded to a tile multiple; padding renders
garbage that is sliced off at reshape.

Per tile: deterministic inverse-uniform sampling -> epipolar projection +
bilinear feature sampling over all source views -> GNT transformer ->
per-ray rgb / depth (sum w*z) / inbound & dynamic counts
(``gnt/renderer.py:207-287``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from pgdvs_tpu.core import cameras, sampling
from pgdvs_tpu.models.gnt.network import GNT
from pgdvs_tpu.models.gnt.feature_net import ResUNet
from pgdvs_tpu.models.gnt.projector import (
    FlatPatchMaps,
    FlatQuadMaps,
    build_fused_maps,
    build_patch_maps,
    build_quad_maps,
    epipolar_sample,
    epipolar_sample_fused,
    epipolar_sample_patch,
    epipolar_sample_patch_raw,
    epipolar_sample_quad_raw,
    flatten_quad_maps,
    quantize_quad_maps,
)
from pgdvs_tpu.renderers.config import RenderConfig


def make_gnt_models(
    netwidth: int = 64,
    depth: int = 8,
    feat_ch: int = 32,
    dtype: str = "bfloat16",
    ret_view_std: bool = False,
):
    """Build the (feature_net, gnt) pair.

    dtype is the transformer activation dtype: bfloat16 is the TPU-native
    choice (half the HBM traffic, MXU-native); pass float32 for bit-accurate
    parity runs against ported torch weights. ret_view_std enables the
    per-block view-consistency diagnostic maps (saved-only outputs; off by
    default since they cost several HBM passes per block).
    """
    return ResUNet(out_channels=feat_ch), GNT(
        netwidth=netwidth,
        depth=depth,
        in_feat_ch=feat_ch,
        dtype=dtype,
        ret_view_std=ret_view_std,
    )


def init_gnt_params(key, feature_net: ResUNet, gnt: GNT, n_src: int = 2):
    """Random-init parameter pytrees (weight port loads over these shapes)."""
    k1, k2 = jax.random.split(key)
    fparams = feature_net.init(k1, jnp.zeros((n_src, 64, 64, 3)))
    s, v, f = 4, n_src, gnt.in_feat_ch
    gparams = gnt.init(
        k2,
        jnp.zeros((2, s, v, 3 + f)),
        jnp.zeros((2, s, v, 4)),
        jnp.ones((2, s, v, 1)),
        jnp.zeros((2, s, 3)),
        jnp.zeros((2, 3)),
    )
    return {"feature_net": fparams, "gnt": gparams}


def render_rays_gnt(
    gnt: GNT,
    gnt_params,
    rays_o,
    rays_d,
    depth_range,
    tgt_cam,
    src_cams,
    src_rgbs,
    src_feats,
    cfg: RenderConfig,
    src_invalid_masks=None,
    src_fused_maps=None,
):
    """Render a fixed-size batch of rays. All inputs are device arrays.

    Args:
      rays_o/rays_d: [R, 3]; depth_range: [R, 2].
      src_*: stacked source views / features.
      src_fused_maps: optional [V, H, W, 3+F(+1)] prebuilt fused maps
        (build_fused_maps); takes precedence over src_rgbs/src_feats for
        sampling.

    Returns dict of per-ray outputs (rgb, depth, weights, inbound_cnt,
    dyn_cnt, view_std, view_std_normalized). With
    ``cfg.n_fine_samples_per_ray > 0`` a second GNT pass runs on the
    importance-resampled (coarse + fine) z values and its outputs are
    returned (the reference's outputs_fine — ``gnt/renderer.py:290-412``).
    """
    n_src = src_cams.shape[0]
    use_pallas = (
        cfg.use_pallas_gnt
        and not gnt.ret_view_std
        and gnt.netwidth == 64
        and gnt.depth == 8
        and rays_o.shape[0] % cfg.pallas_ray_block == 0
    )
    # the fused kernel consumes views-outer [V, R, S, *] natively; producing
    # it at the sampler skips two full-tensor HBM transposes per tile
    views_outer = use_pallas
    # axis of the view dim in proj["mask_*"][..., 0] ([V,R,S] vs [R,S,V])
    view_axis = 0 if views_outer else -1

    fold_ray_diff = (
        use_pallas
        and cfg.pallas_kernel in ("mono3", "mono4")
        and cfg.pallas_fold_ray_diff
        and src_fused_maps is not None
    )
    # mono3: rgb_feat and mask go to the kernel as SEPARATE operands — the
    # concat copy disappears entirely, and the kernel returns the
    # attention-weighted valid-view count (inbound_cnt when dyn mask is
    # off), skipping the XLA-side [V, R, S] mask reductions
    separate_mask = (
        use_pallas
        and cfg.pallas_kernel in ("mono3", "mono4")
        and src_fused_maps is not None
    )
    # mono3 fold_mask: no mask operand at all — the kernel recomputes the
    # inbound & in-front validity from pts + per-view projection rows,
    # and the sampler skips building the [V, R, S, 1] mask entirely
    fold_mask = (
        separate_mask
        and cfg.pallas_fold_mask
        and cfg.pallas_fold_ray_diff
        and not cfg.gnt_use_dyn_mask
        and isinstance(src_fused_maps, (FlatQuadMaps, FlatPatchMaps))
    )
    if fold_mask:
        separate_mask = False
    # mono4 (128-lane sample-pair packing) supports ONLY the full fold set
    # (fold_ray_diff + fold_pos_code + fold_mask); any other configuration
    # silently runs mono3, whose fallbacks cover it. Odd merged coarse+fine
    # sample counts are handled by mono4 itself (pad + in-kernel masking)
    kernel_name = cfg.pallas_kernel
    if use_pallas and kernel_name not in ("mono3", "mono4", "split"):
        raise ValueError(
            f"unknown pallas_kernel {kernel_name!r} (mono/mono2 were retired "
            "after mono3/mono4 superseded them; valid: mono3 | mono4 | split)"
        )
    if kernel_name == "mono4" and not (
        fold_mask and cfg.pallas_fold_pos_code
    ):
        kernel_name = "mono3"
        if cfg.pallas_ablate or not cfg.pallas_precompute_kv:
            # an ablation/pkv run that silently measured the full mono3
            # kernel would corrupt perf-attribution data (ADVICE r3)
            raise ValueError(
                "pallas_ablate/pallas_precompute_kv are mono4-only but the "
                "config forces the mono3 fallback (fold-set mismatch)"
            )
    pack_mask = False  # retired with the mono2 kernel generation
    # mono3 fold_lerp: stream raw quad rows + frac; bilinear combine
    # happens inside the kernel (no [V, R, S, C] lerp tensor in HBM);
    # composes with fold_mask (rows + frac, no mask operand at all)
    fold_lerp = (
        (separate_mask or fold_mask)
        and cfg.pallas_fold_lerp
        and fold_ray_diff
        and not cfg.gnt_use_dyn_mask
        and cfg.epipolar_mode == "quad"
    )

    def gnt_pass(pts, z_vals):
        patch_raw = False
        if isinstance(src_fused_maps, FlatPatchMaps):
            # one gather row per (2x2 ray block, sample, view); validity,
            # ray-diff and pos-code all recomputed in-kernel (fold_* path)
            patch_raw = (
                kernel_name == "mono4" and cfg.pallas_ray_block % 4 == 0
            )
            if patch_raw:
                # mono4: raw rows + stencil coefficients; the combine runs
                # inside the kernel composed with rgbfeat_fc_0 (the XLA
                # combine's [*, C]-minor tensors pad to 128 lanes — ~3.4
                # s/view of wasted HBM traffic at bench scale)
                proj = epipolar_sample_patch_raw(
                    pts, tgt_cam, src_cams, src_fused_maps
                )
            else:
                proj = epipolar_sample_patch(
                    pts, tgt_cam, src_cams, src_fused_maps
                )
        elif src_fused_maps is not None:
            if isinstance(src_fused_maps, FlatQuadMaps):
                maps, scales = src_fused_maps, src_fused_maps.scales
            elif isinstance(src_fused_maps, tuple):
                maps, scales = src_fused_maps
            else:
                maps, scales = src_fused_maps, None
            if fold_lerp:
                proj = epipolar_sample_quad_raw(pts, tgt_cam, src_cams, maps)
            else:
                proj = epipolar_sample_fused(
                    pts, tgt_cam, src_cams, maps,
                    with_mask=cfg.gnt_use_dyn_mask,
                    quad=cfg.epipolar_mode.startswith("quad"),
                    views_outer=views_outer,
                    map_scales=scales,
                    with_ray_diff=not fold_ray_diff,
                    pack_mask=pack_mask,
                    emit_mask=not fold_mask,
                )
        else:
            proj = epipolar_sample(
                pts,
                tgt_cam,
                src_cams,
                src_rgbs,
                src_feats,
                src_invalid_masks if cfg.gnt_use_dyn_mask else None,
                sample_dtype=gnt.dtype if gnt.dtype != "float32" else None,
                views_outer=views_outer,
            )
        if use_pallas:
            kname = kernel_name
            if kname == "mono4":
                from pgdvs_tpu.kernels.gnt_fused_mono4 import (
                    gnt_fused_apply_mono4,
                )
                from pgdvs_tpu.models.gnt.network import sinusoidal_embed

                viewdirs = rays_d / jnp.linalg.norm(
                    rays_d, axis=-1, keepdims=True
                )
                _, map_h, map_w = src_fused_maps.vhw
                centers = jnp.concatenate(
                    [
                        cameras.flat_cam_c2w(tgt_cam)[None, :3, 3],
                        jax.vmap(cameras.flat_cam_c2w)(src_cams)[:, :3, 3],
                    ],
                    axis=0,
                )
                out = gnt_fused_apply_mono4(
                    gnt_params,
                    None if patch_raw else proj["rgb_feat"],
                    pts,
                    sinusoidal_embed(viewdirs),
                    centers,
                    jax.vmap(cameras.flat_cam_projection)(src_cams),
                    (float(map_h), float(map_w)),
                    ray_block=cfg.pallas_ray_block,
                    interpret=jax.default_backend() == "cpu",
                    precompute_kv=cfg.pallas_precompute_kv,
                    ablate=cfg.pallas_ablate,
                    patch_rows=proj["rows"] if patch_raw else None,
                    patch_coef=proj["coef"] if patch_raw else None,
                )
                out = dict(out, view_std=None, view_std_normalized=None)
                weights = out["weights"]
                depth = jnp.sum(weights * z_vals, axis=-1)
                inbound_cnt = out["inbound_cnt_raw"]
                dyn_cnt = jnp.zeros_like(inbound_cnt)
                n_layers = gnt.depth + 1
                std_c = jnp.zeros(
                    weights.shape[:-1] + (n_layers,), jnp.float32
                )
                return {
                    "rgb": out["rgb"],
                    "depth": depth,
                    "weights": weights,
                    "inbound_cnt": inbound_cnt,
                    "dyn_cnt": dyn_cnt,
                    "view_std": std_c,
                    "view_std_normalized": std_c,
                }
            if kname == "mono3":
                from pgdvs_tpu.kernels.gnt_fused_mono3 import (
                    gnt_fused_apply_mono3 as gnt_fused_apply,
                )
            else:
                from pgdvs_tpu.kernels.gnt_fused import gnt_fused_apply
            from pgdvs_tpu.models.gnt.network import sinusoidal_embed

            viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
            kern_kwargs = {}
            if separate_mask:
                kern_kwargs["separate_mask"] = True
            if fold_mask:
                _, map_h, map_w = src_fused_maps.vhw
                kern_kwargs["fold_mask_hw"] = (float(map_h), float(map_w))
                kern_kwargs["proj_mats"] = jax.vmap(
                    cameras.flat_cam_projection
                )(src_cams)
            fold_pos = (
                fold_ray_diff
                and cfg.pallas_fold_pos_code
                and kname == "mono3"
            )
            if fold_pos:
                kern_kwargs["fold_pos_code"] = True
            if fold_lerp:
                kern_kwargs["fold_lerp"] = True
                kern_kwargs["frac"] = proj["frac"]
            if fold_ray_diff:
                centers = jnp.concatenate(
                    [
                        cameras.flat_cam_c2w(tgt_cam)[None, :3, 3],
                        jax.vmap(cameras.flat_cam_c2w)(src_cams)[:, :3, 3],
                    ],
                    axis=0,
                )
                kern_kwargs.update({"pts": pts, "cam_centers": centers})
            out = gnt_fused_apply(
                gnt_params,
                proj["rows"]
                if fold_lerp
                else (proj["packed"] if pack_mask else proj["rgb_feat"]),
                proj["ray_diff"],
                None if (pack_mask or fold_mask) else proj["mask"],
                None if fold_pos else sinusoidal_embed(pts),
                sinusoidal_embed(viewdirs),
                ray_block=cfg.pallas_ray_block,
                # Pallas TPU kernels only interpret on CPU (tests / virtual)
                interpret=jax.default_backend() == "cpu",
                views_outer=views_outer,
                **kern_kwargs,
            )
            # view-std diagnostics are only produced by the flax path; mark
            # with a per-ray zero SENTINEL (not a [R, S, depth+1] zero
            # tensor — weighting 2x38MB of zeros through the compositing
            # sum costs real HBM passes per tile)
            out = dict(out, view_std=None, view_std_normalized=None)
        else:
            out = gnt.apply(
                gnt_params,
                proj["rgb_feat"],
                proj["ray_diff"],
                proj["mask"],
                pts,
                rays_d,
            )
        weights = out["weights"]  # [R, S]
        depth = jnp.sum(weights * z_vals, axis=-1)
        if "inbound_cnt_raw" in out and not cfg.gnt_use_dyn_mask:
            # validity == inbound when the dyn mask is off, so the kernel's
            # weighted valid-view count IS inbound_cnt and dyn_cnt == 0 —
            # the [V, R, S] reduction chains below fold away
            inbound_cnt = out["inbound_cnt_raw"]
            dyn_cnt = jnp.zeros_like(inbound_cnt)
        else:
            inbound_cnt = jnp.sum(
                weights
                * jnp.sum(proj["mask_inbound"][..., 0], axis=view_axis)
                / n_src,
                axis=-1,
            )
            dyn_cnt = jnp.sum(
                weights
                * jnp.sum(proj["mask_invalid"][..., 0], axis=view_axis)
                / n_src,
                axis=-1,
            )
        n_layers = gnt.depth + 1
        if out["view_std"] is None:
            std_c = jnp.zeros(weights.shape[:-1] + (n_layers,), jnp.float32)
            nstd_c = std_c
        else:
            # per-layer diagnostics composited along the ray by the same
            # weights (gnt/renderer.py:297-311)
            std_c = jnp.sum(weights[..., None] * out["view_std"], axis=-2)
            nstd_c = jnp.sum(
                weights[..., None] * out["view_std_normalized"], axis=-2
            )
        return {
            "rgb": out["rgb"],
            "depth": depth,
            "weights": weights,
            "inbound_cnt": inbound_cnt,
            "dyn_cnt": dyn_cnt,
            "view_std": std_c,
            "view_std_normalized": nstd_c,
        }

    pts, z_vals = sampling.sample_along_rays(
        rays_o,
        rays_d,
        depth_range,
        cfg.n_coarse_samples_per_ray,
        inv_uniform=cfg.sample_inv_uniform,
        deterministic=True,
    )
    out = gnt_pass(pts, z_vals)

    if cfg.n_fine_samples_per_ray > 0:
        # importance resampling from the coarse compositing weights, then a
        # second full GNT pass on the merged (sorted) coarse+fine z values
        # (gnt/renderer.py:290-337 + ray_sampler.py:183-220)
        z_fine = sampling.sample_fine_z_vals(
            z_vals,
            out["weights"],
            cfg.n_fine_samples_per_ray,
            inv_uniform=cfg.sample_inv_uniform,
            deterministic=True,
        )
        pts_fine = rays_o[:, None, :] + z_fine[..., None] * rays_d[:, None, :]
        out = gnt_pass(pts_fine, z_fine)
    return out


def resolve_epipolar_cfg(
    cfg: RenderConfig, gnt, rh: int, rw: int, n_rays: Optional[int] = None
) -> RenderConfig:
    """Resolve cfg.epipolar_mode against the render geometry and the fused
    kernel's capabilities, falling back LOUDLY (never silently).

    Returns a (possibly updated) cfg whose epipolar_mode/pallas_patch_block
    every downstream consumer (map builder, sampler, kernel dispatch) can key
    off consistently — the pre-round-5 code updated only a local variable,
    leaving cfg.epipolar_mode='patch' to mis-key the map builder on the
    fallback path (ADVICE r4, high).
    """
    if n_rays is None:
        n_rays = rh * rw
    if cfg.epipolar_mode != "patch":
        return cfg
    from pgdvs_tpu.models.gnt.projector import PATCH_BLOCKS

    patch_block = cfg.pallas_patch_block
    if patch_block not in PATCH_BLOCKS:
        raise ValueError(
            f"unknown pallas_patch_block {patch_block!r}; "
            f"valid: {sorted(PATCH_BLOCKS)}"
        )
    # blocks larger than 2x2 need the in-kernel combine (mono4, rb=4)
    # and divisible render dims; fall back to 2x2 LOUDLY
    by, bx = PATCH_BLOCKS[patch_block][0]
    if patch_block != "2x2" and not (
        cfg.pallas_kernel == "mono4"
        and cfg.pallas_ray_block in (4, 8)
        and rh % by == 0
        and rw % bx == 0
    ):
        import warnings

        warnings.warn(
            f"pallas_patch_block={patch_block!r} needs mono4 + "
            f"ray_block 4 or 8 + render dims divisible by {by}x{bx}; "
            "falling back to '2x2'",
            stacklevel=2,
        )
        patch_block = "2x2"
        by, bx = 2, 2
    # patch mode is the fold-everything fused-kernel fast path; any
    # configuration it cannot serve falls back to quad (per-tap rows)
    # LOUDLY — a silent fallback would corrupt perf-attribution data
    # (ADVICE r3) and quad is numerically equivalent, just slower
    patch_ok = (
        cfg.use_pallas_gnt
        and cfg.pallas_kernel in ("mono3", "mono4")
        and not cfg.gnt_use_dyn_mask
        and cfg.pallas_fold_ray_diff
        and cfg.pallas_fold_pos_code
        and cfg.pallas_fold_mask
        and not gnt.ret_view_std
        and gnt.netwidth == 64
        and gnt.depth == 8
        and rh % by == 0
        and rw % bx == 0
        and min(cfg.ray_tile, n_rays) % (by * bx) == 0
        and min(cfg.ray_tile, n_rays) % cfg.pallas_ray_block == 0
    )
    if not patch_ok:
        import warnings

        warnings.warn(
            "epipolar_mode='patch' requires the fused-kernel fold path "
            "(use_pallas_gnt + fold_ray_diff/pos_code/mask, no dyn mask, "
            "no view-std, even render dims); falling back to 'quad'",
            stacklevel=2,
        )
        return cfg.replace(
            epipolar_mode="quad", pallas_patch_block=patch_block
        )
    return cfg.replace(pallas_patch_block=patch_block)


def build_epipolar_maps(
    cfg: RenderConfig, gnt, src_rgbs, feats, src_invalid_masks=None
):
    """Build the per-view sampling maps for cfg.epipolar_mode.

    Must be called with a RESOLVED cfg (resolve_epipolar_cfg) and OUTSIDE
    any per-tile loop / shard body: the flatten reshapes insert a relayout
    transpose of the full table wherever they sit (FlatQuadMaps docstring).
    Returns None for 'exact' (the sampler reads src_rgbs/feats directly).
    """
    if cfg.epipolar_mode == "patch":
        from pgdvs_tpu.models.gnt.projector import PATCH_BLOCKS

        blk, foot = PATCH_BLOCKS[cfg.pallas_patch_block]
        return build_patch_maps(
            src_rgbs,
            feats,
            dtype=gnt.dtype if gnt.dtype != "float32" else None,
            foot=foot,
            block=blk,
        )
    if cfg.epipolar_mode in ("fused", "quad", "quad_i8"):
        build = (
            build_quad_maps
            if cfg.epipolar_mode.startswith("quad")
            else build_fused_maps
        )
        fused_maps = build(
            src_rgbs,
            feats,
            src_invalid_masks if cfg.gnt_use_dyn_mask else None,
            dtype=gnt.dtype if gnt.dtype != "float32" else None,
        )
        if cfg.epipolar_mode == "quad_i8":
            # per-channel int8 maps: ~2x smaller gather rows; the network
            # consumes the samples in bf16 anyway, so per-channel int8
            # quantization is below its activation precision
            return flatten_quad_maps(*quantize_quad_maps(fused_maps))
        if cfg.epipolar_mode == "quad":
            return flatten_quad_maps(fused_maps)
        return fused_maps
    return None


def patch_ray_perm(n_rays: int, rh: int, rw: int, by: int, bx: int):
    """Ray permutation grouping rays into by x bx pixel blocks (+ inverse).

    Consecutive groups of by*bx permuted rays share one patch gather row per
    (sample, view). Returns (perm, inv_perm) as device arrays.
    """
    import numpy as np

    perm = (
        np.arange(n_rays)
        .reshape(rh // by, by, rw // bx, bx)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )
    return jnp.asarray(perm), jnp.asarray(np.argsort(perm))


def render_rays_tiled(
    gnt,
    gnt_params,
    rays_o,
    rays_d,
    dr,
    tgt_cam,
    src_cams,
    src_rgbs,
    feats,
    cfg: RenderConfig,
    src_invalid_masks=None,
    fused_maps=None,
):
    """lax.map over fixed-size ray tiles; returns FLAT [n_rays, ...] outputs.

    Rays are padded (edge mode) to a tile multiple; padding renders garbage
    that is sliced off. The tile quantum keeps every patch/pallas divisibility
    constraint that resolve_epipolar_cfg validated.
    """
    n_rays = rays_o.shape[0]
    tile = min(cfg.ray_tile, n_rays)
    n_pad = -(-n_rays // tile) * tile
    pad = n_pad - n_rays

    def pad_rays(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1), mode="edge")

    rays_o_t = pad_rays(rays_o).reshape(n_pad // tile, tile, 3)
    rays_d_t = pad_rays(rays_d).reshape(n_pad // tile, tile, 3)
    dr_t = pad_rays(dr).reshape(n_pad // tile, tile, 2)

    def tile_fn(args):
        o, d, r = args
        return render_rays_gnt(
            gnt,
            gnt_params,
            o,
            d,
            r,
            tgt_cam,
            src_cams,
            src_rgbs,
            feats,
            cfg,
            src_invalid_masks=src_invalid_masks,
            src_fused_maps=fused_maps,
        )

    tiled = jax.lax.map(tile_fn, (rays_o_t, rays_d_t, dr_t))
    return {
        k: v.reshape((n_pad,) + v.shape[2:])[:n_rays]
        for k, v in tiled.items()
    }


def render_image_gnt(
    models,
    params,
    tgt_cam,
    src_cams,
    src_rgbs,
    image_hw,
    depth_range,
    cfg: RenderConfig,
    src_invalid_masks=None,
):
    """Render a full novel view with GNT.

    Args:
      models: (feature_net, gnt) modules.
      params: {"feature_net": ..., "gnt": ...} pytrees.
      tgt_cam: [34]; src_cams: [V, 34]; src_rgbs: [V, H, W, 3].
      image_hw: static (H, W) of the *target* image.
      depth_range: [2] scene near/far or [H, W, 2] per-ray (DyCheck).
      cfg: static RenderConfig.

    Returns dict of [rh, rw, C] maps: rgb, depth, inbound_cnt, dyn_cnt,
    oob_mask, view_std(+normalized), and (if gnt_use_dyn_mask) dyn masks.
    """
    feature_net, gnt = models
    h, w = image_hw
    feats = feature_net.apply(params["feature_net"], src_rgbs)

    rays_o, rays_d, _uv, (rh, rw) = cameras.get_rays(
        h, w, cameras.flat_cam_intrinsics(tgt_cam), cameras.flat_cam_c2w(tgt_cam),
        stride=cfg.render_stride,
    )
    n_rays = rh * rw

    cfg = resolve_epipolar_cfg(cfg, gnt, rh, rw, n_rays)
    fused_maps = build_epipolar_maps(
        cfg, gnt, src_rgbs, feats, src_invalid_masks
    )

    if depth_range.ndim == 1:
        dr = jnp.broadcast_to(depth_range, (n_rays, 2))
    else:
        dr = depth_range[:: cfg.render_stride, :: cfg.render_stride].reshape(-1, 2)

    inv_perm = None
    if cfg.epipolar_mode == "patch":
        # reorder rays into by x bx pixel blocks so consecutive ray groups
        # share one patch gather row per (sample, view); outputs are
        # un-permuted at unpad
        from pgdvs_tpu.models.gnt.projector import PATCH_BLOCKS

        by, bx = PATCH_BLOCKS[cfg.pallas_patch_block][0]
        perm, inv_perm = patch_ray_perm(n_rays, rh, rw, by, bx)
        rays_o = rays_o[perm]
        rays_d = rays_d[perm]
        dr = dr[perm]

    flat = render_rays_tiled(
        gnt,
        params["gnt"],
        rays_o,
        rays_d,
        dr,
        tgt_cam,
        src_cams,
        src_rgbs,
        feats,
        cfg,
        src_invalid_masks=src_invalid_masks,
        fused_maps=fused_maps,
    )

    def unpad(x):
        if inv_perm is not None:
            x = x[inv_perm]
        return x.reshape((rh, rw) + x.shape[1:])

    out = {k: unpad(v) for k, v in flat.items()}
    n_src = src_rgbs.shape[0]
    out["oob_mask"] = (
        out["inbound_cnt"] < (cfg.mask_oob_n_proj_thres / n_src)
    ).astype(jnp.float32)
    if cfg.gnt_use_dyn_mask:
        out["dyn_mask_any"] = (out["dyn_cnt"] > 0.0).astype(jnp.float32)
        out["dyn_mask_all"] = (out["dyn_cnt"] == 1.0).astype(jnp.float32)
        out["dyn_mask_thres"] = (
            out["dyn_cnt"] >= (cfg.mask_invalid_n_proj_thres / n_src)
        ).astype(jnp.float32)
    return out

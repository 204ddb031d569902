"""Dynamic-foreground rendering — depth+flow point clouds, softmax-splatted.

TPU re-design of the reference dynamic renderer
(``/root/reference/pgdvs/renderers/pgdvs_renderer_dyn.py``). The reference
compacts dynamic pixels into variable-length point lists (boolean indexing,
per-batch python loops); here everything stays in dense image shapes with
validity masks — every pixel is a *candidate* point, masked in or out — so
the whole pass is one static-shape XLA program:

  1. lift every pixel of temporal-source frame 1 to 3D via its depth;
  2. advect by flow into frame 2, sample frame-2 depth (nearest) and rgb
     (bilinear) at the advected location (reference's align_corners=False
     grid_sample == sampling at uv - 0.5), lift to a second 3D point;
  3. linear time interpolation ``w1*pcl1 + w2*pcl2`` to the target time;
  4. optional Open3D-style statistical outlier removal (masked KNN kernel);
  5. project to the target camera -> per-pixel flow-to-target;
  6. softmax-splat the source rgb along flow-to-target, with static-region
     colors randomized so photo-inconsistency suppresses their splat weight
    (the reference's load-bearing trick, pgdvs_renderer_dyn.py:167-182);
  7. splat the dynamic mask the same way; threshold at 1e-3.

Alternative ``dyn_render_type='pcl'`` renders the same cloud with the
z-buffered point rasterizer kernel instead of splatting.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pgdvs_tpu.core import cameras
from pgdvs_tpu.core.interpolate import bilinear_sample, nearest_sample
from pgdvs_tpu.kernels.knn import statistical_outlier_mask
from pgdvs_tpu.kernels.point_raster import rasterize_points
from pgdvs_tpu.kernels.softsplat import brightness_metric, softsplat
from pgdvs_tpu.renderers.config import RenderConfig


def compute_dyn_pointcloud(
    *,
    rgb_1,
    dyn_mask_1,
    depth_1,
    flow_12,
    flow_12_occ_mask,
    rgb_2,
    depth_2,
    cam_1,
    cam_2,
    cam_tgt,
    time_1,
    time_2,
    time_tgt,
    cfg: RenderConfig,
):
    """Build the time-interpolated dynamic point cloud (dense, masked).

    All images are [H, W, C]; cams are flat-34; times are scalars.

    Returns dict:
      points [H*W, 3] world points at target time,
      colors [H*W, 3],
      valid [H*W] bool (dynamic & flow-in-bounds & not-outlier),
      flow_to_tgt [H, W, 2] per-pixel flow into the target view (0 invalid),
      valid_mask_img [H, W, 1],
      nn_dist_thres scalar (outlier distance threshold, for the tracker).
    """
    h, w, _ = rgb_1.shape
    k1 = cameras.flat_cam_intrinsics(cam_1)
    c2w1 = cameras.flat_cam_c2w(cam_1)
    k2 = cameras.flat_cam_intrinsics(cam_2)
    c2w2 = cameras.flat_cam_c2w(cam_2)

    rays_o, rays_d, uv, _ = cameras.get_rays(h, w, k1, c2w1)
    pcl_1 = rays_o + rays_d * depth_1.reshape(-1, 1)  # [HW, 3]

    dyn = dyn_mask_1.reshape(-1) > 0
    if cfg.dyn_render_use_flow_consistency:
        dyn = dyn & ~(flow_12_occ_mask.reshape(-1) > 0)

    uv_flow = uv + flow_12.reshape(-1, 2)
    flow_ok = (
        (uv_flow[:, 0] >= 0)
        & (uv_flow[:, 0] <= w - 1.0)
        & (uv_flow[:, 1] >= 0)
        & (uv_flow[:, 1] <= h - 1.0)
    )
    valid = dyn & flow_ok

    # frame-2 lookups at the advected uv; reference grid_sample here uses the
    # default align_corners=False with size-normalized coords == uv - 0.5
    x2 = uv_flow[:, 0] - 0.5
    y2 = uv_flow[:, 1] - 0.5
    depth_f2 = nearest_sample(depth_2, x2, y2)[..., 0]  # [HW]
    rgb_f2 = bilinear_sample(rgb_2, x2, y2)  # [HW, 3]

    from pgdvs_tpu.core.geometry import uv_depth_to_world

    pcl_2 = uv_depth_to_world(uv_flow, depth_f2, k2, c2w2)

    same_time = jnp.abs(time_2 - time_1) < 1e-9
    denom = jnp.where(same_time, 1.0, time_2 - time_1)
    w1 = jnp.where(same_time, 1.0, (time_2 - time_tgt) / denom)
    w2 = jnp.where(same_time, 0.0, (time_tgt - time_1) / denom)
    points = w1 * pcl_1 + w2 * pcl_2
    colors = jnp.where(same_time, rgb_1.reshape(-1, 3), rgb_f2)

    nn_dist_thres = jnp.asarray(0.0, jnp.float32)
    if cfg.dyn_pcl_remove_outlier or cfg.dyn_render_track_temporal != "none":
        keep, nn_dist_thres = statistical_outlier_mask(
            points,
            valid,
            k=cfg.dyn_pcl_outlier_knn,
            std_thres=cfg.dyn_pcl_outlier_std_thres,
            tile=cfg.knn_tile,
        )
        if cfg.dyn_pcl_remove_outlier:
            valid = keep

    uv_tgt, _z, _front = cameras.project_points(points, cam_tgt)
    flow_to_tgt = jnp.where(valid[:, None], uv_tgt - uv, 0.0).reshape(h, w, 2)
    valid_mask_img = valid.astype(jnp.float32).reshape(h, w, 1)

    return {
        "points": points,
        "colors": colors,
        "valid": valid,
        "flow_to_tgt": flow_to_tgt,
        "valid_mask_img": valid_mask_img,
        "nn_dist_thres": nn_dist_thres,
    }


def render_dynamic(
    data,
    cfg: RenderConfig,
    key,
    tracker=None,
):
    """Render the dynamic layer for one novel view.

    Args:
      data: dict with the temporal slice of the renderer input contract
        (rgb/dyn_mask/depth_src_temporal [2, H, W, C], flow_fwd [H, W, 2],
        flow_fwd_occ_mask, flat_cam_src_temporal [2, 34], flat_cam_tgt [34],
        time_src_temporal [2], time_tgt [1]); track-source keys when a
        tracker is enabled.
      cfg: static RenderConfig.
      key: PRNG key for the static-region color randomization.
      tracker: optional point tracker; with
        cfg.dyn_render_track_temporal == 'no_tgt' the track branch recovers
        content occluded in the two closest frames and its render is merged
        into pixels the splat leaves uncovered (pgdvs_renderer_dyn.py:229-235).

    Returns dict: rgb [H, W, 3], mask [H, W, 1], plus per-branch intermediates.
    """
    rgb_t = data["rgb_src_temporal"]
    h, w = rgb_t.shape[1], rgb_t.shape[2]

    pcl = compute_dyn_pointcloud(
        rgb_1=rgb_t[0],
        dyn_mask_1=data["dyn_mask_src_temporal"][0],
        depth_1=data["depth_src_temporal"][0],
        flow_12=data["flow_fwd"],
        flow_12_occ_mask=data["flow_fwd_occ_mask"],
        rgb_2=rgb_t[1],
        depth_2=data["depth_src_temporal"][1],
        cam_1=data["flat_cam_src_temporal"][0],
        cam_2=data["flat_cam_src_temporal"][1],
        cam_tgt=data["flat_cam_tgt"],
        time_1=data["time_src_temporal"][0],
        time_2=data["time_src_temporal"][1],
        time_tgt=data["time_tgt"][0],
        cfg=cfg,
    )

    # capacity cap on the dynamic point list (dyn_point_capacity; 0 = keep
    # the dense H*W buffer): compact the valid points into a fixed smaller
    # buffer so the point rasterizer and downstream KNN passes scale with
    # the configured budget instead of the full image. The mesh path keeps
    # the dense buffer (its grid topology is positional).
    cap = cfg.dyn_point_capacity
    point_list = {
        "points": pcl["points"], "colors": pcl["colors"], "valid": pcl["valid"]
    }
    if 0 < cap < h * w:
        idx = jnp.nonzero(pcl["valid"] > 0, size=cap, fill_value=0)[0]
        in_range = jnp.arange(cap) < jnp.sum(
            (pcl["valid"] > 0).astype(jnp.int32)
        )
        valid_c = (pcl["valid"][idx] > 0) & in_range
        point_list = {
            "points": pcl["points"][idx],
            "colors": pcl["colors"][idx],
            "valid": valid_c.astype(pcl["valid"].dtype),
        }

    # zero-dynamic-content guard: splatting a zero mask renders nothing, so
    # the all-static case needs no branch (reference needs an explicit one,
    # pgdvs_renderer_dyn.py:104,133-152)
    if cfg.dyn_render_type == "softsplat":
        dyn_mask = pcl["valid_mask_img"]
        # static-region colors -> clamped gaussian noise so they lose the
        # photo-consistency contest at contested target pixels
        noise = jnp.clip(
            jax.random.normal(key, rgb_t[0].shape, rgb_t[0].dtype), 0.0, 1.0
        )
        rgb_1_rand = rgb_t[0] * dyn_mask + noise * (1.0 - dyn_mask)

        metric = brightness_metric(
            rgb_1_rand, rgb_t[1], data["flow_fwd"], cfg.softsplat_metric_abs_alpha
        )
        splat_rgb = softsplat(rgb_1_rand, pcl["flow_to_tgt"], metric, mode="soft")
        splat_mask = softsplat(dyn_mask, pcl["flow_to_tgt"], metric, mode="soft")
        mask = (splat_mask > 1e-3).astype(jnp.float32)
        rgb = splat_rgb * mask
    elif cfg.dyn_render_type == "pcl":
        rgb, mask = rasterize_points(
            point_list["points"],
            point_list["colors"],
            data["flat_cam_tgt"],
            (h, w),
            valid=point_list["valid"],
            radius=cfg.dyn_render_pcl_pt_radius,
        )
    elif cfg.dyn_render_type == "mesh":
        from pgdvs_tpu.kernels.mesh_raster import rasterize_grid_mesh

        rgb, mask = rasterize_grid_mesh(
            pcl["points"],
            pcl["colors"],
            pcl["valid"],
            data["flat_cam_tgt"],
            (h, w),
        )
    else:
        raise ValueError(f"unknown dyn_render_type={cfg.dyn_render_type!r}")

    out = {
        "temporal_closest_rgb": rgb,
        "temporal_closest_mask": mask,
        "pcl": pcl,
    }

    track_render = None
    if tracker is not None and cfg.dyn_render_track_temporal == "no_tgt":
        from pgdvs_tpu.renderers.dynamic_track import render_with_track

        track_render = render_with_track(
            data,
            cfg,
            tracker,
            base_pcl=dict(point_list, nn_dist_thres=pcl["nn_dist_thres"]),
        )

    if track_render is not None:
        m_track = (
            (~(mask > 0)) & (track_render["mask"] > 0)
        ).astype(jnp.float32)
        rgb = (1.0 - m_track) * rgb + m_track * track_render["rgb"]
        mask = ((mask > 0) | (track_render["mask"] > 0)).astype(jnp.float32)
        out["temporal_track_rgb"] = track_render["rgb"]
        out["temporal_track_mask"] = track_render["mask"]
    else:
        out["temporal_track_rgb"] = jnp.zeros_like(rgb)
        out["temporal_track_mask"] = jnp.zeros_like(mask)

    out["rgb"] = rgb
    out["mask"] = mask
    return out

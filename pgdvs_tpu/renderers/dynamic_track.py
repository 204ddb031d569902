"""Track-based dynamic rendering — recover content occluded in the two
temporally-closest frames.

TPU re-design of ``/root/reference/pgdvs/renderers/pgdvs_renderer_dyn_track.py``:
a point tracker follows every dynamic-mask pixel of the ±K tracking frames
across the whole window; points that are INVISIBLE in both temporally-closest
frames but visible in >= 2 tracking frames are lifted to 3D at their two
temporally-nearest visible frames, linearly interpolated/extrapolated to the
target time, distance-filtered against the base dynamic cloud and
themselves, appended to the base cloud and z-buffer rasterized.

Static-shape design: frames are stacked [T = 2K+2] with a validity mask in
place of the reference's python index lists; queries are a fixed Q-per-frame
capacity selected by mask-ordering (argsort puts dynamic pixels first); all
boolean-index compaction becomes masked arithmetic.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pgdvs_tpu.core.geometry import uv_depth_to_world
from pgdvs_tpu.core import cameras
from pgdvs_tpu.core.interpolate import bilinear_sample, nearest_sample
from pgdvs_tpu.kernels.knn import knn_mean_sq_dist, statistical_outlier_mask
from pgdvs_tpu.kernels.point_raster import rasterize_points
from pgdvs_tpu.renderers.config import RenderConfig


def build_track_stack(data):
    """Stack [fwd-track | temporal-closest | bwd-track] frame data.

    Mirrors ``prepare_data`` (pgdvs_renderer_dyn_track.py:599-764): the
    reference pads the track lists with copies of the temporal frames, so
    every slot holds valid pixels; ``real_track`` marks the slots that came
    from actual extra frames.

    Returns dict of stacked [T, ...] arrays + index/mask metadata.
    """
    k = data["rgb_src_track_fwd"].shape[0]

    rgbs = jnp.concatenate(
        [data["rgb_src_track_fwd"], data["rgb_src_temporal"], data["rgb_src_track_bwd"]]
    )
    masks = jnp.concatenate(
        [
            data["dyn_mask_src_track_fwd"],
            data["dyn_mask_src_temporal"],
            data["dyn_mask_src_track_bwd"],
        ]
    )
    depths = jnp.concatenate(
        [
            data["depth_src_track_fwd"],
            data["depth_src_temporal"],
            data["depth_src_track_bwd"],
        ]
    )
    cams = jnp.concatenate(
        [
            data["flat_cam_src_track_fwd"],
            data["flat_cam_src_temporal"],
            data["flat_cam_src_track_bwd"],
        ]
    )
    times = jnp.concatenate(
        [
            data["time_src_track_fwd"],
            data["time_src_temporal"],
            data["time_src_track_bwd"],
        ]
    )
    t_total = 2 * k + 2
    slot = jnp.arange(t_total)
    n_fwd = data["n_actual_src_track_fwd"][0]
    n_bwd = data["n_actual_src_track_bwd"][0]
    real_track = (slot < n_fwd) | ((slot >= k + 2) & (slot < k + 2 + n_bwd))
    return {
        "rgbs": rgbs,
        "masks": masks,
        "depths": depths,
        "cams": cams,
        "times": times,
        "real_track": real_track,
        "idx_temporal": (k, k + 1),
        "k": k,
    }


def select_queries(stack, queries_per_frame: int):
    """Fixed-capacity query selection: dynamic-mask pixels of each real
    tracking frame (run_track, pgdvs_renderer_dyn_track.py:480-488).

    Returns queries [T*Q, 3] (t, x, y) and valid [T*Q] (temporal slots and
    padded slots are invalid).
    """
    t_total, h, w, _ = stack["masks"].shape
    q = queries_per_frame

    def per_frame(t):
        flat = stack["masks"][t].reshape(-1)
        order = jnp.argsort(-flat)[:q]  # dynamic pixels first
        ys = (order // w).astype(jnp.float32)
        xs = (order % w).astype(jnp.float32)
        valid = (flat[order] > 0) & stack["real_track"][t]
        t_col = jnp.full((q,), t, jnp.float32)
        return jnp.stack([t_col, xs, ys], axis=-1), valid

    queries, valid = jax.vmap(per_frame)(jnp.arange(t_total))
    return queries.reshape(-1, 3), valid.reshape(-1)


def compute_track_pointcloud(
    stack,
    tracks,
    visibles,
    query_valid,
    time_tgt,
    base_points,
    base_colors,
    base_valid,
    base_thres,
    cfg: RenderConfig,
):
    """Lift valid occluded-track points to 3D at the target time.

    Implements compute_pcl_for_tgt (pgdvs_renderer_dyn_track.py:98-396) with
    masks instead of compaction.

    Returns (points [N, 3], colors [N, 3], valid [N]).
    """
    t_total = stack["rgbs"].shape[0]
    i1, i2 = stack["idx_temporal"]
    n_q = tracks.shape[0]

    vis_tc = visibles[:, i1] | visibles[:, i2]
    vis_cnt_track = jnp.sum(
        (visibles & stack["real_track"][None, :]).astype(jnp.int32), axis=1
    )
    valid = query_valid & (~vis_tc) & (vis_cnt_track >= 2)

    # two temporally-nearest *visible* frames per query
    time_diff = jnp.abs(stack["times"][None, :] - time_tgt)
    time_diff = jnp.where(visibles, time_diff, jnp.inf)
    # (track frames only? the reference allows any visible frame incl. the
    #  temporal slots — but a valid query is invisible there by definition)
    _, top2 = jax.lax.top_k(-time_diff, 2)  # [N, 2] frame indices

    # per-frame samples at the tracked positions, then select the top-2
    h_f, w_f = stack["rgbs"].shape[1], stack["rgbs"].shape[2]

    def sample_frame(t):
        xy = tracks[:, t]
        # The reference rgb lookup normalizes by (w, h) yet passes
        # align_corners=True (pgdvs_renderer_dyn_track.py:203-216), which
        # shrinks the effective sample to u*(w-1)/w; its depth lookup keeps
        # the grid_sample default align_corners=False (:223-229), i.e.
        # samples at u - 0.5. Both quirks are replicated for output parity
        # (A/B: tests/test_dyn_branch_ab.py). Border caveat: at u < 0.5 the
        # reference's zero padding returns depth 0 (point collapses to the
        # camera center) where this clamps to the edge depth — a
        # measure-small region the trackers effectively never hit.
        rgb = bilinear_sample(
            stack["rgbs"][t],
            xy[:, 0] * (w_f - 1) / w_f,
            xy[:, 1] * (h_f - 1) / h_f,
        )
        depth = nearest_sample(
            stack["depths"][t], xy[:, 0] - 0.5, xy[:, 1] - 0.5
        )[:, 0]
        pts = uv_depth_to_world(
            xy,
            depth,
            cameras.flat_cam_intrinsics(stack["cams"][t]),
            cameras.flat_cam_c2w(stack["cams"][t]),
        )
        return rgb, pts

    rgb_all, pts_all = jax.vmap(sample_frame)(jnp.arange(t_total))
    rgb_all = jnp.swapaxes(rgb_all, 0, 1)  # [N, T, 3]
    pts_all = jnp.swapaxes(pts_all, 0, 1)  # [N, T, 3]

    take = lambda arr, idx: jnp.take_along_axis(arr, idx[:, :, None], axis=1)
    p12 = take(pts_all, top2)  # [N, 2, 3]
    c12 = take(rgb_all, top2)
    t12 = jnp.take_along_axis(stack["times"][None, :].repeat(n_q, 0), top2, axis=1)

    ratio = (time_tgt - t12[:, 0:1]) / (t12[:, 1:2] - t12[:, 0:1] + 1e-8)
    points = p12[:, 0] + (p12[:, 1] - p12[:, 0]) * ratio
    colors = jnp.mean(c12, axis=1)

    # distance filter vs the base dynamic cloud (mean over K+1 nearest)
    d2base = knn_mean_sq_dist(
        points,
        valid,
        k=cfg.dyn_pcl_outlier_knn + 1,
        tile=cfg.knn_tile,
        candidates=base_points,
        cand_valid=base_valid,
        exclude_self=False,
    )
    valid = valid & (
        d2base < base_thres * cfg.dyn_pcl_track_track2base_thres_mult
    )

    # self statistical filter reusing the base threshold
    keep, _ = statistical_outlier_mask(
        points,
        valid,
        k=cfg.dyn_pcl_outlier_knn,
        std_thres=cfg.dyn_pcl_outlier_std_thres,
        tile=cfg.knn_tile,
        dist_thres=base_thres,
    )
    return points, colors, keep


def render_with_track(
    data,
    cfg: RenderConfig,
    tracker,
    base_pcl: dict,
):
    """Full track branch: track -> lift -> filter -> merge -> rasterize.

    Args:
      data: contract dict incl. the track-source keys.
      tracker: callable (frames, queries, valid) -> (tracks, visibles).
      base_pcl: dict from ``compute_dyn_pointcloud`` (points/colors/valid/
        nn_dist_thres).

    Query capacity comes from ``cfg.track_queries_per_frame``; the default
    (0 = every pixel) matches the reference, which tracks ALL dyn-mask
    pixels (pgdvs_renderer_dyn_track.py:480-488) — no silent drop.

    Returns {'rgb': [H, W, 3], 'mask': [H, W, 1]}.
    """
    h, w = data["rgb_src_temporal"].shape[1:3]
    stack = build_track_stack(data)
    q_cap = cfg.track_queries_per_frame or h * w
    queries, q_valid = select_queries(stack, q_cap)

    any_queries = jnp.any(q_valid)
    tracks, visibles = tracker(stack["rgbs"], queries, q_valid)

    points, colors, valid = compute_track_pointcloud(
        stack,
        tracks,
        visibles,
        q_valid,
        data["time_tgt"][0],
        base_pcl["points"],
        base_pcl["colors"],
        base_pcl["valid"],
        base_pcl["nn_dist_thres"],
        cfg,
    )

    # merge with the base cloud and rasterize
    all_pts = jnp.concatenate([points, base_pcl["points"]])
    all_cols = jnp.concatenate([colors, base_pcl["colors"]])
    all_valid = jnp.concatenate([valid & any_queries, base_pcl["valid"]])

    rgb, mask = rasterize_points(
        all_pts,
        all_cols,
        data["flat_cam_tgt"],
        (h, w),
        valid=all_valid,
        radius=cfg.dyn_render_pcl_pt_radius,
    )
    return {"rgb": rgb, "mask": mask}

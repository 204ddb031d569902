"""Named benchmark / ablation bundles.

Preserves the reference's 17 curated ``benchmark_type`` names
(``/root/reference/scripts/benchmark.sh:56-269``) as RenderConfig override
bundles. Each entry: render_cfg overrides + static mode + dataset + tracker
selection. ``resolve_benchmark(name)`` returns everything the CLI needs.

Name legend: st = static branch (cvd = consistent-video-depth point cloud,
gnt = transformer), dy = dynamic branch, pcl_clean = statistical outlier
removal, masked_attn / masked_input = GNT dynamic-mask handling, zoed =
ZoeDepth instead of CVD depth, track_* = occlusion recovery via tracking.
"""

from __future__ import annotations

from typing import Any, Dict

from pgdvs_tpu.renderers.config import RenderConfig

BENCHMARK_TYPES: Dict[str, Dict[str, Any]] = {
    "st_cvd_dy_cvd": {
        "static_mode": "geo",
        "dataset": "nvidia_eval_pure_geo",
        "render_cfg": dict(
            st_pcl_remove_outlier=False,
            dyn_pcl_remove_outlier=False,
            st_render_pcl_pt_radius=0.01,
            st_render_pcl_pts_per_pixel=3,
        ),
    },
    "st_cvd_dy_cvd_pcl_clean": {
        "static_mode": "geo",
        "dataset": "nvidia_eval_pure_geo",
        "render_cfg": dict(
            st_pcl_remove_outlier=False,
            dyn_pcl_remove_outlier=True,
            st_render_pcl_pt_radius=0.01,
            st_render_pcl_pts_per_pixel=3,
        ),
    },
    "st_cvd_pcl_clean_dy_cvd_pcl_clean": {
        "static_mode": "geo",
        "dataset": "nvidia_eval_pure_geo",
        "render_cfg": dict(
            st_pcl_remove_outlier=True,
            st_pcl_outlier_knn=50,
            st_pcl_outlier_std_thres=0.2,
            dyn_pcl_remove_outlier=True,
            st_render_pcl_pt_radius=0.01,
            st_render_pcl_pts_per_pixel=3,
        ),
    },
    "st_gnt": {
        "static_mode": "gnt",
        "render_cfg": dict(
            pure_gnt=True, gnt_use_dyn_mask=False, gnt_use_masked_spatial_src=False
        ),
    },
    "st_gnt_masked_attn": {
        "static_mode": "gnt",
        "render_cfg": dict(
            pure_gnt_with_dyn_mask=True,
            gnt_use_dyn_mask=True,
            gnt_use_masked_spatial_src=False,
        ),
    },
    "st_gnt_dy_cvd": {
        "static_mode": "gnt",
        "render_cfg": dict(
            gnt_use_dyn_mask=False,
            gnt_use_masked_spatial_src=False,
            dyn_pcl_remove_outlier=False,
        ),
    },
    "st_gnt_dy_cvd_pcl_clean": {
        "static_mode": "gnt",
        "render_cfg": dict(
            gnt_use_dyn_mask=False,
            gnt_use_masked_spatial_src=False,
            dyn_pcl_remove_outlier=True,
        ),
    },
    "st_gnt_masked_input_dy_cvd": {
        "static_mode": "gnt",
        "render_cfg": dict(
            gnt_use_dyn_mask=False,
            gnt_use_masked_spatial_src=True,
            dyn_pcl_remove_outlier=False,
        ),
    },
    "st_gnt_masked_input_attn_dy_cvd_pcl_clean": {
        "static_mode": "gnt",
        "render_cfg": dict(
            gnt_use_dyn_mask=True,
            gnt_use_masked_spatial_src=True,
            dyn_pcl_remove_outlier=True,
        ),
    },
    "st_gnt_masked_input_dy_cvd_pcl_clean": {
        "static_mode": "gnt",
        "render_cfg": dict(
            gnt_use_dyn_mask=False,
            gnt_use_masked_spatial_src=True,
            dyn_pcl_remove_outlier=True,
        ),
    },
    # the paper's main configuration
    "default": {
        "static_mode": "gnt",
        "render_cfg": dict(
            gnt_use_dyn_mask=True,
            gnt_use_masked_spatial_src=False,
            dyn_pcl_remove_outlier=True,
        ),
    },
    "st_gnt_masked_attn_dy_cvd_pcl_clean_render_point": {
        "static_mode": "gnt",
        "render_cfg": dict(
            gnt_use_dyn_mask=True,
            gnt_use_masked_spatial_src=False,
            dyn_pcl_remove_outlier=True,
            dyn_render_type="pcl",
            dyn_render_pcl_pt_radius=0.01,
            dyn_render_pcl_pts_per_pixel=3,
        ),
    },
    "st_gnt_masked_attn_dy_cvd_pcl_clean_render_mesh": {
        "static_mode": "gnt",
        "render_cfg": dict(
            gnt_use_dyn_mask=True,
            gnt_use_masked_spatial_src=False,
            dyn_pcl_remove_outlier=True,
            dyn_render_type="mesh",
        ),
    },
    "st_gnt_masked_attn_dy_zoed_pcl_clean": {
        "static_mode": "gnt",
        "render_cfg": dict(
            gnt_use_dyn_mask=True,
            gnt_use_masked_spatial_src=False,
            dyn_pcl_remove_outlier=True,
        ),
        "dataset_args": dict(
            use_zoe_depth="k_me_med_share",
            zoe_depth_data_path="nvidia_long_zoedepth",
        ),
    },
    "st_gnt_masked_attn_dy_cvd_pcl_clean_track_tapir": {
        "static_mode": "gnt",
        "tracker": "tapir",
        "render_cfg": dict(
            gnt_use_dyn_mask=True,
            gnt_use_masked_spatial_src=False,
            dyn_pcl_remove_outlier=True,
            dyn_render_track_temporal="no_tgt",
            dyn_pcl_track_track2base_thres_mult=50,
        ),
        "dataset_args": dict(with_track_sources=True),
    },
    "st_gnt_masked_attn_dy_cvd_pcl_clean_track_tapir_raw_res": {
        "static_mode": "gnt",
        "tracker": "tapir_raw_res",
        "render_cfg": dict(
            gnt_use_dyn_mask=True,
            gnt_use_masked_spatial_src=False,
            dyn_pcl_remove_outlier=True,
            dyn_render_track_temporal="no_tgt",
            dyn_pcl_track_track2base_thres_mult=50,
        ),
        "dataset_args": dict(with_track_sources=True),
    },
    "st_gnt_masked_attn_dy_cvd_pcl_clean_track_cotracker": {
        "static_mode": "gnt",
        "tracker": "cotracker",  # flax CoTracker port (needs the released
        #                          checkpoint; tracker='lk' is weight-free)
        "render_cfg": dict(
            gnt_use_dyn_mask=True,
            gnt_use_masked_spatial_src=False,
            dyn_pcl_remove_outlier=True,
            dyn_render_track_temporal="no_tgt",
            dyn_pcl_track_track2base_thres_mult=50,
        ),
        "dataset_args": dict(with_track_sources=True),
    },
    "visualize_nvidia_max_disp_32": {
        "static_mode": "gnt",
        "engine": "vis",
        "dataset": "nvidia_vis",
        "dataset_args": dict(
            n_render_frames=400,
            vis_center_time=50,
            vis_time_interval=50,
            vis_bt_max_disp=32,
        ),
        "render_cfg": dict(gnt_use_dyn_mask=True),
    },
    "visualize_nvidia_max_disp_64": {
        "static_mode": "gnt",
        "engine": "vis",
        "dataset": "nvidia_vis",
        "dataset_args": dict(
            n_render_frames=400,
            vis_center_time=50,
            vis_time_interval=50,
            vis_bt_max_disp=64,
        ),
        "render_cfg": dict(gnt_use_dyn_mask=True),
    },
}

# alias preserved from the reference
BENCHMARK_TYPES["st_gnt_masked_attn_dy_cvd_pcl_clean"] = BENCHMARK_TYPES["default"]


def resolve_benchmark(name: str, preset: str = "fast"):
    """Return (render_cfg, spec dict) for a named benchmark bundle.

    preset='fast' (default) applies apply_perf_preset — each bundle compiles
    its fastest serviceable kernel configuration (the program bench.py
    measures, for the bundles its flags allow). preset='exact' keeps the
    reference-faithful exact sampler (the pre-round-5 behavior).
    """
    if name not in BENCHMARK_TYPES:
        raise KeyError(f"unknown benchmark {name!r}; known: {sorted(BENCHMARK_TYPES)}")
    if preset not in ("fast", "exact"):
        raise KeyError(f"unknown perf preset {preset!r}; valid: fast | exact")
    spec = dict(BENCHMARK_TYPES[name])
    cfg = RenderConfig(**spec.get("render_cfg", {}))
    if preset == "fast":
        from pgdvs_tpu.renderers.config import apply_perf_preset

        cfg = apply_perf_preset(cfg)
    return cfg, spec


def make_tracker(name: str):
    """Instantiate a tracker by benchmark name."""
    if name in (None, "none"):
        return None
    if name == "lk":
        from pgdvs_tpu.models.tracking import LucasKanadeTracker

        return LucasKanadeTracker()
    if name.startswith("tapir"):
        from pgdvs_tpu.models.tracking.tapir import make_tapir_tracker

        return make_tapir_tracker(keep_raw_res=name.endswith("raw_res"))
    if name == "cotracker":
        from pgdvs_tpu.models.tracking.cotracker import CoTrackerTracker
        from pgdvs_tpu.models.tracking.cotracker_port import (
            load_cotracker_checkpoint,
        )

        params = load_cotracker_checkpoint()
        if params is None:
            raise FileNotFoundError(
                "CoTracker checkpoint not found (set PGDVS_CKPT_DIR with "
                "cotracker/cotracker_stride_4_wind_8.pth); the weight-free "
                "fallback is tracker='lk'"
            )
        return CoTrackerTracker(params=params)
    raise KeyError(f"unknown tracker {name!r}")

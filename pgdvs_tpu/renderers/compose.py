"""Top-level novel-view renderer: static + dynamic + composite.

TPU equivalent of ``PGDVSRenderer.forward``
(``/root/reference/pgdvs/renderers/pgdvs_renderer.py:83-180``): render the
static background (GNT or aggregated point cloud), render the dynamic
foreground, composite ``(1 - dyn_mask) * static + dyn_mask * dyn``.

The whole function is jittable: `data` is a pytree of fixed-shape arrays
(the renderer input contract, SURVEY.md appendix), `cfg` is static. The
engine wraps it in jit (optionally sharded over a device mesh, see
``pgdvs_tpu.parallel``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pgdvs_tpu.renderers.config import RenderConfig
from pgdvs_tpu.renderers.dynamic import render_dynamic
from pgdvs_tpu.renderers.static_geo import render_static_geo
from pgdvs_tpu.renderers.static_gnt import render_image_gnt


def render_novel_view(
    models,
    params,
    data,
    cfg: RenderConfig,
    key,
    static_mode: str = "gnt",
    tracker=None,
):
    """Render one novel (space, time) view.

    Args:
      models: (feature_net, gnt) flax modules (unused for static_mode='geo').
      params: parameter pytrees for the models.
      data: renderer input contract for ONE view (no batch dim): see
        SURVEY.md appendix / pgdvs_renderer.py:84-103. Static keys consumed:
        rgb_src_spatial / static_rgb_src_spatial [V, H, W, 3],
        dyn_mask_src_spatial [V, H, W, 1], flat_cam_src_spatial [V, 34],
        flat_cam_tgt [34], depth_range [2] or [H, W, 2]; dynamic keys: see
        `render_dynamic`.
      cfg: static RenderConfig.
      key: PRNG key (dynamic branch randomization).
      static_mode: 'gnt' | 'geo'.
      tracker: optional point tracker (pgdvs_tpu.models.tracking) enabling
        the track branch when cfg.dyn_render_track_temporal == 'no_tgt'.

    Returns dict with combined_rgb and every intermediate the evaluator and
    visualizer consume.
    """
    h, w = data["rgb_src_temporal"].shape[1:3]
    ret = {}

    if static_mode == "gnt":
        src_rgbs = (
            data["static_rgb_src_spatial"]
            if cfg.gnt_use_masked_spatial_src
            else data["rgb_src_spatial"]
        )
        st = render_image_gnt(
            models,
            params,
            data["flat_cam_tgt"],
            data["flat_cam_src_spatial"],
            src_rgbs,
            (h, w),
            data["depth_range"],
            cfg,
            src_invalid_masks=data.get("dyn_mask_src_spatial"),
        )
        static_rgb = st["rgb"]
        ret.update({f"static_coarse_{k}": v for k, v in st.items()})
        if cfg.pure_gnt or cfg.pure_gnt_with_dyn_mask:
            ret["combined_rgb"] = static_rgb
            return ret
    elif static_mode == "geo":
        static_rgb, static_mask = render_static_geo(
            data["st_pcl_rgb"],
            data["flat_cam_tgt"],
            (h, w),
            cfg,
            valid=data.get("st_pcl_valid"),
        )
        ret["geo_static_rgb"] = static_rgb
        ret["geo_static_mask"] = static_mask
    else:
        raise ValueError(static_mode)

    dyn = render_dynamic(data, cfg, key, tracker=tracker)
    dyn_rgb = dyn["rgb"]
    dyn_mask = dyn["mask"]

    if cfg.render_stride > 1:
        rh, rw = static_rgb.shape[0], static_rgb.shape[1]
        dyn_rgb = jax.image.resize(dyn_rgb, (rh, rw, 3), "cubic")
        dyn_mask = (
            jax.image.resize(dyn_mask, (rh, rw, 1), "nearest") > 0
        ).astype(jnp.float32)

    combined = (1.0 - dyn_mask) * static_rgb + dyn_mask * dyn_rgb

    ret.update(
        {
            "render_dyn_rgb": dyn_rgb,
            "render_dyn_mask": dyn_mask,
            "render_dyn_temporal_closest_rgb": dyn["temporal_closest_rgb"],
            "render_dyn_temporal_closest_mask": dyn["temporal_closest_mask"],
            "render_dyn_temporal_track_rgb": dyn["temporal_track_rgb"],
            "render_dyn_temporal_track_mask": dyn["temporal_track_mask"],
            "combined_rgb": combined,
            "combined_rgb_static": (1.0 - dyn_mask) * static_rgb,
            "combined_rgb_dyn": dyn_mask * dyn_rgb,
        }
    )
    return ret

"""Static background from an aggregated point cloud (pure-geometry mode).

TPU equivalent of the reference StaticGeoPointRenderer
(``/root/reference/pgdvs/renderers/st_geo_renderer.py``): optional
statistical outlier removal on the whole-video static cloud, then z-buffered
point splatting into the target camera (replacing pytorch3d
PointsRasterizer + NormWeightedCompositor with the Pallas/XLA kernel).
"""

from __future__ import annotations

import jax.numpy as jnp

from pgdvs_tpu.kernels.knn import statistical_outlier_mask
from pgdvs_tpu.kernels.point_raster import rasterize_points
from pgdvs_tpu.renderers.config import RenderConfig


def render_static_geo(st_pcl_rgb, tgt_cam, image_hw, cfg: RenderConfig, valid=None):
    """Render the aggregated static point cloud.

    Args:
      st_pcl_rgb: [N, 6] packed (xyz, rgb) — the dataset contract
        (``nvidia_eval_pure_geo.py:432``); N is a padded static capacity.
      tgt_cam: [34]; image_hw: static (H, W).
      valid: [N] bool for padded entries.

    Returns: rgb [H, W, 3], mask [H, W, 1].
    """
    points = st_pcl_rgb[:, :3]
    colors = st_pcl_rgb[:, 3:6]
    if valid is None:
        valid = jnp.ones((points.shape[0],), bool)
    if cfg.st_pcl_remove_outlier:
        keep, _ = statistical_outlier_mask(
            points,
            valid,
            k=cfg.st_pcl_outlier_knn,
            std_thres=cfg.st_pcl_outlier_std_thres,
            tile=cfg.knn_tile,
        )
        valid = keep
    rgb, mask = rasterize_points(
        points,
        colors,
        tgt_cam,
        image_hw,
        valid=valid,
        radius=cfg.st_render_pcl_pt_radius,
    )
    return rgb, mask

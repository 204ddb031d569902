"""Debug visual dumps — intermediate inspection artifacts.

Equivalent of the reference's debug-flag machinery (SURVEY.md §4.2):
``for_debug=True`` point-cloud exports at every dynamic-pipeline stage
(``pgdvs_renderer_dyn.py:322-498``), epipolar projection overlays
(``projector.py:168-247``), and `debug_ret`-style dumps of every
intermediate image (``trainer_pgdvs.py:385-452``).

Everything here runs OUTSIDE jit on host copies of the intermediates.
"""

from __future__ import annotations

import logging
import pathlib

import numpy as np
import jax
import jax.numpy as jnp

from pgdvs_tpu.utils.vis import colorize_depth, flow_to_color, save_ply_points

LOGGER = logging.getLogger(__name__)


def dump_render_intermediates(out, data, out_dir, prefix: str = "debug"):
    """Save every image-shaped intermediate of a render output dict as PNG
    (plus flow/depth visualizations of the inputs)."""
    import PIL.Image

    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    def save_img(name, arr):
        arr = np.asarray(arr)
        if arr.ndim == 3 and arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, -1)
        if arr.ndim != 3 or arr.shape[-1] != 3:
            return
        img = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        PIL.Image.fromarray(img).save(out_dir / f"{prefix}_{name}.png")

    for k, val in out.items():
        if hasattr(val, "ndim"):
            save_img(k, val)
    for k in ("rgb_tgt",):
        if k in data:
            save_img(k, data[k])
    if "flow_fwd" in data:
        PIL.Image.fromarray(flow_to_color(np.asarray(data["flow_fwd"]))).save(
            out_dir / f"{prefix}_flow_fwd.png"
        )
    if "depth_src_temporal" in data:
        PIL.Image.fromarray(
            colorize_depth(np.asarray(data["depth_src_temporal"])[0, ..., 0])
        ).save(out_dir / f"{prefix}_depth_src0.png")
    LOGGER.info("debug dumps written to %s", out_dir)


def dump_dynamic_pointclouds(data, cfg, out_dir, key=None):
    """Export the dynamic point cloud at each pipeline stage as PLY
    (reference for_debug exports: dyn_pcl_1/dyn_pcl/dyn_pcl_cleaned)."""
    from pgdvs_tpu.renderers.dynamic import compute_dyn_pointcloud

    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    dev = {k: jnp.asarray(v) for k, v in data.items() if not isinstance(v, (dict, str))}

    pcl = compute_dyn_pointcloud(
        rgb_1=dev["rgb_src_temporal"][0],
        dyn_mask_1=dev["dyn_mask_src_temporal"][0],
        depth_1=dev["depth_src_temporal"][0],
        flow_12=dev["flow_fwd"],
        flow_12_occ_mask=dev["flow_fwd_occ_mask"],
        rgb_2=dev["rgb_src_temporal"][1],
        depth_2=dev["depth_src_temporal"][1],
        cam_1=dev["flat_cam_src_temporal"][0],
        cam_2=dev["flat_cam_src_temporal"][1],
        cam_tgt=dev["flat_cam_tgt"],
        time_1=dev["time_src_temporal"][0],
        time_2=dev["time_src_temporal"][1],
        time_tgt=dev["time_tgt"][0],
        cfg=cfg,
    )
    pts = np.asarray(pcl["points"])
    cols = np.asarray(pcl["colors"])
    valid = np.asarray(pcl["valid"])
    save_ply_points(out_dir / "dyn_pcl_all.ply", pts[valid], np.clip(cols[valid], 0, 1))
    LOGGER.info(
        "dynamic pcl: %d/%d valid points -> %s", valid.sum(), len(valid), out_dir
    )
    return pcl


def dump_epipolar_overlay(data, out_dir, pix_rc=(None, None), n_samples: int = 64):
    """Draw the epipolar projections of one target pixel's samples onto each
    spatial source view (reference FLAG_DEBUG_EPIPOLAR)."""
    import PIL.Image

    from pgdvs_tpu.core import cameras, sampling

    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    h, w = data["rgb_src_spatial"].shape[1:3]
    row = pix_rc[0] if pix_rc[0] is not None else h // 2
    col = pix_rc[1] if pix_rc[1] is not None else w // 2

    tgt = jnp.asarray(data["flat_cam_tgt"])
    rays_o, rays_d, _, _ = cameras.get_rays(
        h, w, cameras.flat_cam_intrinsics(tgt), cameras.flat_cam_c2w(tgt)
    )
    idx = row * w + col
    dr = np.asarray(data["depth_range"]).reshape(-1, 2)[0]
    pts, _ = sampling.sample_along_rays(
        rays_o[idx : idx + 1],
        rays_d[idx : idx + 1],
        jnp.asarray(dr)[None],
        n_samples,
        inv_uniform=True,
    )
    colors = (np.linspace(0, 255, n_samples)).astype(np.uint8)
    for v in range(data["rgb_src_spatial"].shape[0]):
        cam = jnp.asarray(data["flat_cam_src_spatial"][v])
        uv, _z, front = cameras.project_points(pts[0], cam)
        uv = np.asarray(uv)
        img = (np.asarray(data["rgb_src_spatial"][v]) * 255).astype(np.uint8).copy()
        for i, (x, y) in enumerate(uv):
            xi, yi = int(round(x)), int(round(y))
            if 1 <= xi < w - 1 and 1 <= yi < h - 1:
                img[yi - 1 : yi + 2, xi - 1 : xi + 2] = [colors[i], 64, 255 - colors[i]]
        PIL.Image.fromarray(img).save(out_dir / f"epi_src_{v:02d}.png")
    LOGGER.info("epipolar overlays for pixel (%d, %d) -> %s", row, col, out_dir)

"""End-to-end renderer tests against analytic synthetic ground truth.

The dynamic splat path and the pure-geometry static path are weight-free,
so their output must reconstruct the analytic target view to high fidelity.
The GNT path is smoke-tested for shapes/finiteness (its quality depends on
pretrained weights, exercised separately by the weight-port tests).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pgdvs_tpu.data.synthetic import make_contract_data
from pgdvs_tpu.metrics.psnr_ssim import masked_psnr
from pgdvs_tpu.renderers.config import RenderConfig
from pgdvs_tpu.renderers.dynamic import render_dynamic
from pgdvs_tpu.renderers.static_geo import render_static_geo

H, W = 48, 60


@pytest.fixture(scope="module")
def data():
    return make_contract_data(h=H, w=W, n_spatial=4, n_frames=8, tgt_time=0.5)


def _dev(data):
    return {
        k: jnp.asarray(v)
        for k, v in data.items()
        if not isinstance(v, (dict, str))
    }


def test_dynamic_splat_reconstructs_target(data):
    cfg = RenderConfig(knn_tile=512)
    out = render_dynamic(_dev(data), cfg, jax.random.PRNGKey(0))
    rgb = np.asarray(out["rgb"])
    mask = np.asarray(out["mask"])
    tgt_dyn = np.asarray(data["misc"]["tgt_dyn_mask"])
    tgt = np.asarray(data["rgb_tgt"])

    # rendered dynamic mask must overlap the target's true dynamic region
    inter = (mask[..., 0] > 0) & (tgt_dyn[..., 0] > 0)
    union = (mask[..., 0] > 0) | (tgt_dyn[..., 0] > 0)
    iou = inter.sum() / max(union.sum(), 1)
    assert iou > 0.6, f"dynamic mask IoU too low: {iou}"

    # where both agree it is dynamic, colors must match the target closely
    m = inter[..., None].astype(np.float64)
    psnr = masked_psnr(np.clip(rgb, 0, 1), tgt, np.repeat(m, 3, -1))
    assert psnr > 25.0, f"dynamic region PSNR {psnr}"


def test_dynamic_pcl_mode_runs(data):
    cfg = RenderConfig(dyn_render_type="pcl", knn_tile=512)
    out = render_dynamic(_dev(data), cfg, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert np.asarray(out["mask"]).sum() > 0


def test_dynamic_no_dynamic_content_renders_empty(data):
    d = _dev(data)
    d["dyn_mask_src_temporal"] = jnp.zeros_like(d["dyn_mask_src_temporal"])
    cfg = RenderConfig(knn_tile=512)
    out = render_dynamic(d, cfg, jax.random.PRNGKey(0))
    assert float(jnp.sum(out["mask"])) == 0.0
    assert float(jnp.sum(jnp.abs(out["rgb"]))) == 0.0


def test_static_geo_reconstructs_background(data):
    # the default 0.01 NDC radius is tuned for 288x550; at 48x60 it is a
    # sub-pixel footprint, so scale it up to keep coverage comparable
    cfg = RenderConfig(st_render_pcl_pt_radius=0.08)
    rgb, mask = render_static_geo(
        jnp.asarray(data["st_pcl_rgb"]),
        jnp.asarray(data["flat_cam_tgt"]),
        (H, W),
        cfg,
        valid=jnp.asarray(data["st_pcl_valid"]),
    )
    rgb, mask = np.asarray(rgb), np.asarray(mask)
    tgt = np.asarray(data["rgb_tgt"])
    tgt_static = 1.0 - np.asarray(data["misc"]["tgt_dyn_mask"])
    m = (mask > 0) * tgt_static
    assert m.sum() > 0.5 * tgt_static.sum(), "geo raster covers too little"
    psnr = masked_psnr(np.clip(rgb, 0, 1), tgt, np.repeat(m, 3, -1))
    assert psnr > 22.0, f"static geo PSNR {psnr}"


def test_full_compose_geo_mode(data):
    from pgdvs_tpu.renderers.compose import render_novel_view

    cfg = RenderConfig(knn_tile=512)
    out = jax.jit(
        lambda d, k: render_novel_view(
            None, None, d, cfg, k, static_mode="geo"
        )
    )(_dev(data), jax.random.PRNGKey(1))
    pred = np.asarray(out["combined_rgb"])
    assert np.isfinite(pred).all()
    tgt = np.asarray(data["rgb_tgt"])
    # full-image reconstruction: background from pcl + dynamic from splat
    covered = (
        (np.asarray(out["geo_static_mask"]) > 0)
        | (np.asarray(out["render_dyn_mask"]) > 0)
    ).astype(np.float64)
    psnr = masked_psnr(np.clip(pred, 0, 1), tgt, np.repeat(covered, 3, -1))
    assert psnr > 20.0, f"composite PSNR {psnr}"


def test_dyn_point_capacity_caps_point_list():
    """dyn_point_capacity > 0 compacts the dynamic point list to a fixed
    budget for the pcl rasterizer; the render must match the dense-buffer
    render when the capacity covers all valid points."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pgdvs_tpu.data.synthetic import make_contract_data
    from pgdvs_tpu.renderers.config import RenderConfig
    from pgdvs_tpu.renderers.dynamic import render_dynamic

    data = make_contract_data(h=24, w=32, n_spatial=2, n_frames=6)
    dev = {
        k: jnp.asarray(v) for k, v in data.items()
        if not isinstance(v, (dict, str))
    }
    key = jax.random.PRNGKey(0)

    base = dict(n_coarse_samples_per_ray=8, ray_tile=128,
                dyn_render_type="pcl")
    dense = render_dynamic(dev, RenderConfig(**base), key)
    capped = render_dynamic(
        dev, RenderConfig(**base, dyn_point_capacity=24 * 32), key
    )
    np.testing.assert_allclose(
        np.asarray(capped["rgb"]), np.asarray(dense["rgb"]), atol=1e-5
    )

    # a small budget still renders (fewer points, valid subset only)
    small = render_dynamic(
        dev, RenderConfig(**base, dyn_point_capacity=64), key
    )
    assert np.isfinite(np.asarray(small["rgb"])).all()
    assert (np.asarray(small["mask"]) <= np.asarray(dense["mask"]) + 1e-6).all()

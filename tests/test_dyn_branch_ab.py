"""Dynamic-branch A/B vs the REFERENCE ``compute_dyn_pcl``.

Runs the reference dynamic renderer's numerical core
(``/root/reference/pgdvs/renderers/pgdvs_renderer_dyn.py:275-540`` —
masked depth lift, flow advection + frame-2 depth/rgb lookup, temporal
point interpolation, Open3D-style statistical outlier removal, projection
to the target camera / flow-to-target) on a tiny random scene against this
framework's dense-masked ``compute_dyn_pointcloud``.

The synthetic e2e tests (test_renderers_e2e.py) bound reconstruction
quality but would not catch a half-pixel sampling offset or a filter-chain
ordering difference; this A/B pins those numerics the same way
test_e2e_static_ab.py does for the static branch. The reference's
pytorch3d ``knn_points`` dependency is replaced by an exact brute-force
torch oracle (same squared-distance semantics), and its CUDA-only
softsplat / raster legs are NOT covered here — those kernels have their
own parity tests (test_kernels.py).

Covered axes: time_1 != time_2 and time_1 == time_2; outlier removal
on/off; flow-consistency gating on/off.
"""

import pathlib
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference"

H, W = 36, 44
KNN = 8


def _stub_missing_deps(torch):
    """Stub the reference's CUDA/vis-stack imports (hydra/cupy/cv2/trimesh/
    pytorch3d); ``knn_points`` gets an exact brute-force torch oracle
    matching pytorch3d's contract (ascending SQUARED distances, self
    included at K+1)."""
    for name in (
        "hydra", "hydra.utils", "cupy", "cv2", "trimesh",
        "pytorch3d", "pytorch3d.utils", "pytorch3d.ops",
        "pgdvs.utils.vis_utils", "pgdvs.utils.training",
    ):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    hydra = sys.modules["hydra"]
    hydra.utils = sys.modules["hydra.utils"]
    hydra.utils.instantiate = lambda *a, **k: None
    sys.modules["cupy"].memoize = lambda **k: (lambda f: f)
    sys.modules["pgdvs.utils.vis_utils"].draw_cam_mesh = lambda *a, **k: None
    sys.modules["pgdvs.utils.training"].disabled_train = lambda self, *a: self
    sys.modules["trimesh"].PointCloud = None

    def knn_points(q, c, K=1, return_nn=False):
        d2 = ((q[0][:, None, :] - c[0][None, :, :]) ** 2).sum(-1)
        dists, idx = torch.topk(d2, K, dim=1, largest=False)
        nn = c[0][idx]
        return dists[None], idx[None], nn[None]

    p3d = sys.modules["pytorch3d"]
    p3d.utils = sys.modules["pytorch3d.utils"]
    p3d.ops = sys.modules["pytorch3d.ops"]
    p3d.ops.knn_points = knn_points


def _import_reference():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _stub_missing_deps(torch)
    # pgdvs_renderer_dyn mkdirs a debug dir under the READ-ONLY reference
    # tree at import time — neutralize mkdir for the duration of the import
    orig_mkdir = pathlib.Path.mkdir
    pathlib.Path.mkdir = lambda self, *a, **k: None
    try:
        from pgdvs.renderers.pgdvs_renderer_dyn import PGDVSDynamicRenderer
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference modules unavailable: {e}")
    finally:
        pathlib.Path.mkdir = orig_mkdir
    return torch, PGDVSDynamicRenderer


def _scene(same_time):
    import jax
    rng = np.random.default_rng(7)
    k4 = np.eye(4, dtype=np.float32)
    k4[0, 0] = k4[1, 1] = 50.0
    k4[0, 2], k4[1, 2] = W / 2.0, H / 2.0

    def c2w(dx, dy, ang=0.0):
        m = np.eye(4, dtype=np.float32)
        ca, sa = np.cos(ang), np.sin(ang)
        m[0, 0], m[0, 2] = ca, sa
        m[2, 0], m[2, 2] = -sa, ca
        m[0, 3], m[1, 3] = dx, dy
        return m

    cams = {
        "c2w_1": c2w(0.0, 0.0),
        "c2w_2": c2w(0.12, -0.05, 0.02),
        "c2w_tgt": c2w(0.05, 0.04, -0.015),
    }

    def smooth(shape_hw, lo, hi, ch):
        small = rng.uniform(lo, hi, (shape_hw[0] // 4, shape_hw[1] // 4, ch))
        return np.asarray(
            jax.image.resize(jnp.asarray(small, jnp.float32),
                             (shape_hw[0], shape_hw[1], ch), "linear")
        )

    data = {
        "rgb_1": smooth((H, W), 0, 1, 3),
        "rgb_2": smooth((H, W), 0, 1, 3),
        "depth_1": smooth((H, W), 2.0, 4.0, 1),
        "depth_2": smooth((H, W), 2.0, 4.0, 1),
        # flows large enough to push edge pixels out of bounds
        "flow_12": smooth((H, W), -4.0, 4.0, 2),
        "occ_mask": (rng.uniform(size=(H, W, 1)) > 0.85).astype(np.float32),
    }
    yy, xx = np.mgrid[0:H, 0:W]
    blob = ((yy - H / 2) ** 2 + (xx - W / 2) ** 2) < 13.0**2
    blob |= rng.uniform(size=(H, W)) > 0.9
    data["dyn_mask_1"] = blob[..., None].astype(np.float32)

    times = (0.2, 0.2 if same_time else 0.4, 0.2 if same_time else 0.33)
    return k4, cams, data, times


def _flat_cam(k4, c2w):
    return np.concatenate(
        [np.asarray([H, W], np.float32), k4.reshape(-1), c2w.reshape(-1)]
    ).astype(np.float32)


def _run_reference(torch, RefDyn, k4, cams, data, times, *,
                   remove_outlier, use_consistency):
    from pgdvs.models.gnt.projector import Projector
    from pgdvs.renderers.pgdvs_renderer_base import PGDVSBaseRenderer

    ren = RefDyn(
        cfg=types.SimpleNamespace(rgb_range="0_1"),
        proj_func=Projector().compute_projections,
        use_tracker=False,
    )
    t = lambda a: torch.tensor(np.asarray(a, np.float32))

    rayger = object.__new__(PGDVSBaseRenderer)
    ray_o, ray_d, uvs, _, _ = PGDVSBaseRenderer.get_batched_rays(
        rayger,
        device="cpu",
        batch_size=1,
        H=H,
        W=W,
        render_stride=1,
        intrinsics=t(k4[None]),
        c2w=t(cams["c2w_1"][None]),
    )

    render_cfg = types.SimpleNamespace(
        dyn_render_use_flow_consistency=use_consistency,
        dyn_pcl_remove_outlier=remove_outlier,
        dyn_pcl_outlier_knn=KNN,
        dyn_pcl_outlier_std_thres=1.0,
        dyn_render_type="softsplat",
    )
    with torch.no_grad():
        flow_to_tgt, valid_mask, info = ren.compute_dyn_pcl(
            dyn_mask_1=t(data["dyn_mask_1"]),
            rgb_1=t(data["rgb_1"]),
            uvs_1=uvs,
            ray_o_1=ray_o,
            ray_d_1=ray_d,
            depth_1=t(data["depth_1"]),
            flow_12=t(data["flow_12"]),
            flow_12_occ_mask=t(data["occ_mask"]),
            rgb_2=t(data["rgb_2"]),
            depth_2=t(data["depth_2"]),
            K_2=t(k4),
            c2w_2=t(cams["c2w_2"]),
            flat_cam_tgt=t(_flat_cam(k4, cams["c2w_tgt"])),
            time_1=times[0],
            time_2=times[1],
            time_tgt=times[2],
            render_cfg=render_cfg,
        )
    return (
        flow_to_tgt.numpy(),
        valid_mask.numpy(),
        info["pcl"].numpy(),
        info["pcl_rgbs"].numpy(),
        float(info["pcl_nn_dist_thres"]),
    )


def _run_ours(k4, cams, data, times, *, remove_outlier, use_consistency):
    from pgdvs_tpu.core import cameras
    from pgdvs_tpu.renderers.config import RenderConfig
    from pgdvs_tpu.renderers.dynamic import compute_dyn_pointcloud

    cfg = RenderConfig(
        dyn_render_use_flow_consistency=use_consistency,
        dyn_pcl_remove_outlier=remove_outlier,
        dyn_pcl_outlier_knn=KNN,
        dyn_pcl_outlier_std_thres=1.0,
        knn_tile=256,
        dyn_render_track_temporal="none",
    )
    out = compute_dyn_pointcloud(
        rgb_1=jnp.asarray(data["rgb_1"]),
        dyn_mask_1=jnp.asarray(data["dyn_mask_1"]),
        depth_1=jnp.asarray(data["depth_1"]),
        flow_12=jnp.asarray(data["flow_12"]),
        flow_12_occ_mask=jnp.asarray(data["occ_mask"]),
        rgb_2=jnp.asarray(data["rgb_2"]),
        depth_2=jnp.asarray(data["depth_2"]),
        cam_1=jnp.asarray(_flat_cam(k4, cams["c2w_1"])),
        cam_2=jnp.asarray(_flat_cam(k4, cams["c2w_2"])),
        cam_tgt=jnp.asarray(_flat_cam(k4, cams["c2w_tgt"])),
        time_1=jnp.asarray(times[0]),
        time_2=jnp.asarray(times[1]),
        time_tgt=jnp.asarray(times[2]),
        cfg=cfg,
    )
    return {k: np.asarray(v) for k, v in out.items()}


@pytest.mark.parametrize(
    "same_time,remove_outlier,use_consistency",
    [
        (False, True, True),
        (False, False, False),
        (True, True, False),
    ],
)
def test_dyn_pcl_matches_reference(same_time, remove_outlier, use_consistency):
    torch, RefDyn = _import_reference()
    k4, cams, data, times = _scene(same_time)

    ref_flow, ref_mask, ref_pcl, ref_rgb, ref_thres = _run_reference(
        torch, RefDyn, k4, cams, data, times,
        remove_outlier=remove_outlier, use_consistency=use_consistency,
    )
    ours = _run_ours(
        k4, cams, data, times,
        remove_outlier=remove_outlier, use_consistency=use_consistency,
    )

    # the surviving-point masks must agree pixel-for-pixel
    np.testing.assert_array_equal(
        ours["valid_mask_img"][..., 0] > 0, ref_mask[..., 0] > 0
    )

    # compacted reference points are in raster order == ours[valid] order
    valid = ours["valid"] > 0
    assert ref_pcl.shape[0] == int(valid.sum())
    np.testing.assert_allclose(
        ours["points"][valid], ref_pcl, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        ours["colors"][valid], ref_rgb, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        ours["flow_to_tgt"], ref_flow, rtol=1e-3, atol=2e-3
    )
    if remove_outlier:
        np.testing.assert_allclose(
            float(ours["nn_dist_thres"]), ref_thres, rtol=1e-4
        )

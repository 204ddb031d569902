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


def _stub_module(name):
    """A sys.modules stub with a real ModuleSpec: importlib.util.find_spec
    raises ValueError on spec-less modules, which breaks later imports that
    probe optional deps (e.g. transformers checking torchvision)."""
    import importlib.machinery
    import types as _types

    mod = _types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod

H, W = 36, 44
KNN = 8


def _stub_missing_deps(torch):
    """Stub the reference's CUDA/vis-stack imports (hydra/cupy/cv2/trimesh/
    pytorch3d); ``knn_points`` gets an exact brute-force torch oracle
    matching pytorch3d's contract (ascending SQUARED distances, self
    included at K+1)."""
    for name in (
        "hydra", "hydra.utils", "cupy", "trimesh", "torchvision",
        "torchvision.utils",
        "pytorch3d", "pytorch3d.utils", "pytorch3d.ops",
        "pgdvs.utils.vis_utils", "pgdvs.utils.training",
        # tracker interfaces pull in dlpack/model stacks the track-branch
        # math never touches
        "pgdvs.models.tapnet.interface", "pgdvs.models.cotracker.interface",
    ):
        if name not in sys.modules:
            sys.modules[name] = _stub_module(name)
    sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]
    sys.modules["pgdvs.models.tapnet.interface"].TAPNetInterface = None
    sys.modules["pgdvs.models.cotracker.interface"].CoTrackerInterface = None
    hydra = sys.modules["hydra"]
    hydra.utils = sys.modules["hydra.utils"]
    hydra.utils.instantiate = lambda *a, **k: None
    sys.modules["cupy"].memoize = lambda **k: (lambda f: f)
    # einops probes sys.modules for frameworks: without a real
    # ndarray type it registers a broken cupy backend
    sys.modules["cupy"].ndarray = type("ndarray", (), {})
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


# ---------------------------------------------------------------------------
# Track branch: compute_pcl_for_tgt vs compute_track_pointcloud
# ---------------------------------------------------------------------------

T_FWD = 3  # track frames per side; total stack = 2*T_FWD + 2


def _track_scene():
    import jax
    rng = np.random.default_rng(11)
    t_total = 2 * T_FWD + 2
    n_q = 160

    k4 = np.eye(4, dtype=np.float32)
    k4[0, 0] = k4[1, 1] = 50.0
    k4[0, 2], k4[1, 2] = W / 2.0, H / 2.0

    def c2w(i):
        m = np.eye(4, dtype=np.float32)
        ang = 0.01 * (i - t_total / 2)
        ca, sa = np.cos(ang), np.sin(ang)
        m[0, 0], m[0, 2] = ca, sa
        m[2, 0], m[2, 2] = -sa, ca
        m[0, 3], m[1, 3] = 0.04 * i, -0.02 * i
        return m

    def smooth(lo, hi, ch):
        small = rng.uniform(lo, hi, (t_total, H // 4, W // 4, ch))
        return np.asarray(
            jax.image.resize(jnp.asarray(small, jnp.float32),
                             (t_total, H, W, ch), "linear")
        )

    frames = {
        "rgbs": smooth(0, 1, 3),
        "depths": smooth(2.0, 4.0, 1),
        "cams": np.stack([_flat_cam(k4, c2w(i)) for i in range(t_total)]),
        # distinct offsets so no |time - tgt| ties among visible frames
        "times": (np.arange(t_total) * 0.1 + 0.013).astype(np.float32),
    }
    time_tgt = float(frames["times"][T_FWD] + 0.043)

    # tracks inside [1, size-2]: avoids the reference's zero-padded
    # depth-at-(u-0.5) border band, which this port intentionally clamps
    tracks = rng.uniform(
        [1.0, 1.0], [W - 2.0, H - 2.0], (n_q, t_total, 2)
    ).astype(np.float32)
    visibles = rng.uniform(size=(n_q, t_total)) > 0.4
    # make a healthy subset invisible in both temporal slots
    visibles[: n_q // 2, T_FWD : T_FWD + 2] = False

    base_pcl = rng.uniform(-0.5, 0.5, (240, 3)).astype(np.float32) + np.array(
        [0.0, 0.0, 3.0], np.float32
    )
    base_rgbs = rng.uniform(0, 1, (240, 3)).astype(np.float32)
    base_thres = 0.35

    return frames, time_tgt, tracks, visibles, base_pcl, base_rgbs, base_thres


def test_track_pcl_matches_reference():
    torch, RefDyn = _import_reference()
    del RefDyn
    from pgdvs.renderers.pgdvs_renderer_dyn_track import (
        PGDVSDynamicTrackRenderer,
    )

    (frames, time_tgt, tracks, visibles, base_pcl, base_rgbs,
     base_thres) = _track_scene()
    t_total = 2 * T_FWD + 2
    n_q = tracks.shape[0]
    t = lambda a: torch.tensor(np.asarray(a, np.float32))

    render_cfg = types.SimpleNamespace(
        dyn_pcl_outlier_knn=KNN,
        dyn_pcl_outlier_std_thres=1.0,
        dyn_pcl_track_track2base_thres_mult=4.0,
    )

    ren = object.__new__(PGDVSDynamicTrackRenderer)
    with torch.no_grad():
        ref_pcl, ref_rgbs = PGDVSDynamicTrackRenderer.compute_pcl_for_tgt(
            ren,
            data_for_track={
                "idx_temporal_closest": [T_FWD, T_FWD + 1],
                "idx_real_track": (
                    list(range(T_FWD)) + list(range(T_FWD + 2, t_total))
                ),
                "time_for_track": t(frames["times"]),
                "time_tgt": t(time_tgt),
                "rgbs_for_track": t(frames["rgbs"]),
                "depths_for_track": t(frames["depths"]),
                "flat_cams_for_track": t(frames["cams"]),
            },
            query_pts=t(np.zeros((n_q, 3))),  # unused by the math
            tracks=t(tracks),
            track_visibles=torch.tensor(visibles),
            render_cfg=render_cfg,
            base_pcl_info={
                "pcl": t(base_pcl),
                "pcl_rgbs": t(base_rgbs),
                "pcl_nn_dist_thres": torch.tensor(base_thres),
            },
            device="cpu",
        )
    ref_pcl = ref_pcl.numpy()
    ref_rgbs = ref_rgbs.numpy()
    # reference appends the base cloud after filtering — split it back off
    assert ref_pcl.shape[0] >= base_pcl.shape[0]
    n_track = ref_pcl.shape[0] - base_pcl.shape[0]
    np.testing.assert_array_equal(ref_pcl[n_track:], base_pcl)
    ref_pcl, ref_rgbs = ref_pcl[:n_track], ref_rgbs[:n_track]

    from pgdvs_tpu.renderers.config import RenderConfig
    from pgdvs_tpu.renderers.dynamic_track import compute_track_pointcloud

    cfg = RenderConfig(
        dyn_pcl_outlier_knn=KNN,
        dyn_pcl_outlier_std_thres=1.0,
        dyn_pcl_track_track2base_thres_mult=4.0,
        knn_tile=256,
    )
    real_track = np.ones(t_total, bool)
    real_track[T_FWD : T_FWD + 2] = False
    stack = {
        "rgbs": jnp.asarray(frames["rgbs"]),
        "depths": jnp.asarray(frames["depths"]),
        "cams": jnp.asarray(frames["cams"]),
        "times": jnp.asarray(frames["times"]),
        "real_track": jnp.asarray(real_track),
        "idx_temporal": (T_FWD, T_FWD + 1),
        "k": T_FWD,
    }
    points, colors, keep = compute_track_pointcloud(
        stack,
        jnp.asarray(tracks),
        jnp.asarray(visibles),
        jnp.ones((n_q,), bool),
        jnp.asarray(time_tgt),
        jnp.asarray(base_pcl),
        jnp.asarray(base_rgbs),
        jnp.ones((base_pcl.shape[0],), bool),
        jnp.asarray(base_thres),
        cfg,
    )
    keep = np.asarray(keep)
    assert n_track > 20, "test scene produced too few surviving track points"
    assert int(keep.sum()) == n_track
    np.testing.assert_allclose(
        np.asarray(points)[keep], ref_pcl, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(colors)[keep], ref_rgbs, rtol=1e-4, atol=1e-5
    )


def test_softsplat_metric_matches_reference():
    """A/B the brightness-constancy metric (backwarp + clipped -alpha*l1)
    against the reference's ``softsplat_img`` metric leg
    (pgdvs_renderer_base.py:59-138) — pins the backwarp grid convention
    (align_corners=True, zero padding, flow in pixel units)."""
    torch, RefDyn = _import_reference()
    del RefDyn
    from pgdvs.renderers.pgdvs_renderer_base import PGDVSBaseRenderer

    from pgdvs_tpu.kernels.softsplat import brightness_metric

    rng = np.random.default_rng(3)
    rgb1 = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    rgb2 = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    flow = rng.uniform(-5, 5, (H, W, 2)).astype(np.float32)
    alpha = 100.0

    ren = object.__new__(PGDVSBaseRenderer)
    with torch.no_grad():
        warped = PGDVSBaseRenderer.backwarp_for_softsplat_metric(
            ren,
            tenIn=torch.tensor(rgb2).permute(2, 0, 1)[None],
            tenFlow=torch.tensor(flow).permute(2, 0, 1)[None],
        )
        l1 = torch.nn.functional.l1_loss(
            torch.tensor(rgb1).permute(2, 0, 1)[None], warped,
            reduction="none",
        ).mean(dim=1, keepdim=True)
        ref = (-alpha * l1).clip(-alpha, alpha)[0, 0].numpy()

    ours = np.asarray(
        brightness_metric(
            jnp.asarray(rgb1), jnp.asarray(rgb2), jnp.asarray(flow), alpha
        )
    )[..., 0]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

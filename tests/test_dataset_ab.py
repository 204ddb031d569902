"""NVIDIA eval dataset A/B vs the REFERENCE reader.

Points the reference's ``NvidiaDynEvaluationDataset``
(``/root/reference/pgdvs/datasets/nvidia_eval.py``) at the same fake
on-disk scene the unit tests write (``test_datasets.build_fake_scene``) and
asserts every shared contract key agrees with ``NvidiaEvalDataset``:
pose parsing + LLFF axis flips, intrinsics construction, mono-camera
round-robin, temporal/spatial/track source selection, the
spatial-point-cloud depth range, flow occlusion thresholding, eval masks,
and the dyn/static rgb decompositions.

Scope notes: the fixture's images/depths/flows are already at the target
resolution, so the resize legs (cv2 INTER_AREA / INTER_NEAREST, LANCZOS
mono fallback) are NOT exercised. Zoe depth variants have their own unit
tests (test_datasets.py).
"""

import pathlib
import sys
import types

import numpy as np
import PIL.Image
import pytest

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


def _ensure_stub(name):
    if name not in sys.modules:
        sys.modules[name] = _stub_module(name)
    return sys.modules[name]


def _stub_missing_deps():
    for name in ("hydra", "hydra.utils", "cupy", "trimesh",
                 "pgdvs.utils.vis_utils"):
        _ensure_stub(name)
    hydra = sys.modules["hydra"]
    hydra.utils = sys.modules["hydra.utils"]
    sys.modules["pgdvs.utils.vis_utils"].draw_cam_mesh = lambda *a, **k: None
    if hasattr(sys.modules.get("cupy"), "__spec__") and not hasattr(
        sys.modules["cupy"], "ndarray"
    ):
        sys.modules["cupy"].ndarray = type("ndarray", (), {})
    sys.modules["trimesh"].PointCloud = None

    # cv2 is installed for real in this image; never stub it — a stub in
    # sys.modules would shadow the real library for every later import


def _import_reference():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _stub_missing_deps()
    orig_mkdir = pathlib.Path.mkdir
    pathlib.Path.mkdir = lambda self, *a, **k: None
    try:
        import pgdvs.datasets.nvidia_eval as ref_mod
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference modules unavailable: {e}")
    finally:
        pathlib.Path.mkdir = orig_mkdir
    return torch, ref_mod


# reference key -> ours (None = same name)
KEY_MAP = {
    "rgb_tgt": None,
    "rgb_src_spatial": None,
    "dyn_rgb_src_spatial": None,
    "static_rgb_src_spatial": None,
    "rgb_src_temporal": None,
    "dyn_rgb_src_temporal": None,
    "static_rgb_src_temporal": None,
    "dyn_mask_src_spatial": None,
    "dyn_mask_src_temporal": None,
    "eval_mask": None,
    "flow_fwd": None,
    "flow_fwd_occ_mask": None,
    "flow_bwd": None,
    "flow_bwd_occ_mask": None,
    "flat_cam_tgt": None,
    "flat_cam_src_spatial": None,
    "flat_cam_src_temporal": None,
    "depth_src_spatial": None,
    "depth_src_temporal": None,
    "depth_range": None,
    "time_tgt": None,
    "time_src_temporal": None,
    "seq_ids": None,
    "rgb_src_temporal_track_fwd2tgt": "rgb_src_track_fwd",
    "rgb_src_temporal_track_bwd2tgt": "rgb_src_track_bwd",
    "dyn_mask_src_temporal_track_fwd2tgt": "dyn_mask_src_track_fwd",
    "dyn_mask_src_temporal_track_bwd2tgt": "dyn_mask_src_track_bwd",
    "depth_src_temporal_track_fwd2tgt": "depth_src_track_fwd",
    "depth_src_temporal_track_bwd2tgt": "depth_src_track_bwd",
    "flat_cam_src_temporal_track_fwd2tgt": "flat_cam_src_track_fwd",
    "flat_cam_src_temporal_track_bwd2tgt": "flat_cam_src_track_bwd",
    "time_src_temporal_track_fwd2tgt": "time_src_track_fwd",
    "time_src_temporal_track_bwd2tgt": "time_src_track_bwd",
    "n_actual_temporal_track_fwd2tgt": "n_actual_src_track_fwd",
    "n_actual_temporal_track_bwd2tgt": "n_actual_src_track_bwd",
}


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    from test_datasets import build_fake_scene

    # pose_jitter breaks the default camera path's zero-baseline pairs whose
    # pixel-center-exact projections make the pure-geo coverage truncation
    # an f32 coin flip (see build_fake_scene docstring)
    return build_fake_scene(
        tmp_path_factory.mktemp("nvidia_ab"), pose_jitter=0.013
    )


def test_nvidia_dataset_matches_reference(scene_root):
    from test_datasets import H as FIX_H

    torch, ref_mod = _import_reference()
    # the reference hard-asserts the DynIBaR eval height; the fixture scene
    # is smaller — patch the module constant (read at item time)
    orig_tgt_h = ref_mod.TGT_HEIGHT
    ref_mod.TGT_HEIGHT = FIX_H
    try:
        ref_ds = ref_mod.NvidiaDynEvaluationDataset(
            data_root=str(scene_root),
            raw_data_dir="raw",
            depth_data_dir="depths",
            mask_data_dir="flowmask",
            flow_data_dir="flowmask",
            max_hw=-1,
            mode="eval",
            scene_ids=["Balloon1"],
            n_src_views_spatial=3,
            n_src_views_temporal_track_one_side=2,
        )

        from pgdvs_tpu.data.nvidia_eval import NvidiaEvalDataset

        ours_ds = NvidiaEvalDataset(
            data_root=str(scene_root),
            raw_data_dir="raw",
            depth_data_dir="depths",
            mask_data_dir="flowmask",
            flow_data_dir="flowmask",
            n_src_views_spatial=3,
            n_src_views_temporal_track_one_side=2,
            with_track_sources=True,
            tgt_height=FIX_H,
        )

        assert len(ref_ds) == len(ours_ds) > 0

        for idx in range(len(ref_ds)):
            ref = ref_ds[idx]
            ours = ours_ds[idx]

            # same (frame, camera) enumeration order
            assert ref["misc"]["tgt_frame_id"] == ours["misc"]["tgt_frame_id"]
            assert ref["misc"]["tgt_cam_id"] == ours["misc"]["tgt_cam_id"]
            assert int(ref["n_actual_temporal"][0]) == (
                ours["misc"]["n_actual_temporal"]
            )

            for ref_key, our_key in KEY_MAP.items():
                r = ref[ref_key]
                if isinstance(r, torch.Tensor):
                    r = r.numpy()
                o = np.asarray(ours[our_key or ref_key])
                assert r.shape == o.shape, (
                    f"[{idx}] {ref_key}: {r.shape} vs {o.shape}"
                )
                np.testing.assert_allclose(
                    o, r, rtol=1e-5, atol=1e-5,
                    err_msg=f"[item {idx}] key {ref_key}",
                )
    finally:
        ref_mod.TGT_HEIGHT = orig_tgt_h


def test_pure_geo_static_pcl_matches_reference(scene_root):
    """A/B the whole-video static point-cloud aggregation
    (nvidia_eval_pure_geo.py:183-277): per-frame static unprojection with
    projection-coverage skip. Scope: all scene points lie in front of every
    camera — the reference projects without a z>0 filter (behind-camera
    points can spuriously mark coverage via sign-flipped uv), which this
    port deliberately filters."""
    from test_datasets import H as FIX_H

    torch, ref_mod = _import_reference()
    del torch
    import pgdvs.datasets.nvidia_eval_pure_geo as ref_geo_mod

    orig = (ref_mod.TGT_HEIGHT, ref_geo_mod.TGT_HEIGHT)
    ref_mod.TGT_HEIGHT = FIX_H
    ref_geo_mod.TGT_HEIGHT = FIX_H
    try:
        ref_ds = ref_geo_mod.NvidiaDynPureGeoEvaluationDataset(
            data_root=str(scene_root),
            raw_data_dir="raw",
            depth_data_dir="depths",
            mask_data_dir="flowmask",
            flow_data_dir="flowmask",
            max_hw=-1,
            mode="eval",
            scene_ids=["Balloon1"],
        )
        ref_pcl = ref_ds._aggregate_static_pcl("Balloon1")

        from pgdvs_tpu.data.nvidia_pure_geo import NvidiaPureGeoEvalDataset

        ours_ds = NvidiaPureGeoEvalDataset(
            data_root=str(scene_root),
            raw_data_dir="raw",
            depth_data_dir="depths",
            mask_data_dir="flowmask",
            flow_data_dir="flowmask",
            n_src_views_spatial=3,
            tgt_height=FIX_H,
        )
        ours_pcl = ours_ds._aggregate_static_pcl("Balloon1")

        assert ours_pcl.shape == ref_pcl.shape
        np.testing.assert_allclose(ours_pcl, ref_pcl, rtol=1e-5, atol=1e-5)
    finally:
        ref_mod.TGT_HEIGHT, ref_geo_mod.TGT_HEIGHT = orig


VIS_KEYS = [
    "rgb_src_spatial", "dyn_rgb_src_spatial", "static_rgb_src_spatial",
    "rgb_src_temporal", "dyn_rgb_src_temporal", "static_rgb_src_temporal",
    "dyn_mask_src_spatial", "dyn_mask_src_temporal",
    "flow_fwd", "flow_fwd_occ_mask", "flow_bwd", "flow_bwd_occ_mask",
    "flat_cam_tgt", "flat_cam_src_spatial", "flat_cam_src_temporal",
    # (no depth_src_spatial: the reference vis dict omits it; ours keeps it
    # for contract uniformity)
    "depth_src_temporal", "depth_range",
    "time_tgt", "time_src_temporal",
]
VIS_TRACK_FWD = {
    "rgb_src_temporal_track_fwd2tgt": "rgb_src_track_fwd",
    "dyn_mask_src_temporal_track_fwd2tgt": "dyn_mask_src_track_fwd",
    "depth_src_temporal_track_fwd2tgt": "depth_src_track_fwd",
    "flat_cam_src_temporal_track_fwd2tgt": "flat_cam_src_track_fwd",
    "time_src_temporal_track_fwd2tgt": "time_src_track_fwd",
}
VIS_TRACK_BWD = {
    "rgb_src_temporal_track_bwd2tgt": "rgb_src_track_bwd",
    "dyn_mask_src_temporal_track_bwd2tgt": "dyn_mask_src_track_bwd",
    "depth_src_temporal_track_bwd2tgt": "depth_src_track_bwd",
    "flat_cam_src_temporal_track_bwd2tgt": "flat_cam_src_track_bwd",
    "time_src_temporal_track_bwd2tgt": "time_src_track_bwd",
}


def test_nvidia_vis_dataset_matches_reference(scene_root):
    """A/B the visualization trajectory items: slerp+lerp interpolated
    virtual cameras composed with scene-scaled bullet-time offsets, the
    fractional-time temporal/spatial source selection, and the vis
    contract. The reference's bwd track window additionally includes
    temporal[1] itself as slot 0 (a K+1-slot quirk of nvidia_vis.py:399-410
    absent from its eval reader, outcome-neutral downstream); the
    comparison drops that slot and re-pads."""
    from test_datasets import H as FIX_H

    torch, ref_mod = _import_reference()
    # the reference quaternion slerp uses np.mat (removed in NumPy 2.0)
    if not hasattr(np, "mat"):
        np.mat = np.asmatrix
    import pgdvs.datasets.nvidia_vis as ref_vis_mod

    n_track = 2
    orig = (ref_mod.TGT_HEIGHT, ref_vis_mod.TGT_HEIGHT)
    ref_mod.TGT_HEIGHT = FIX_H
    ref_vis_mod.TGT_HEIGHT = FIX_H
    try:
        ref_ds = ref_vis_mod.NvidiaDynVisualizationDataset(
            data_root=str(scene_root),
            raw_data_dir="raw",
            depth_data_dir="depths",
            mask_data_dir="flowmask",
            flow_data_dir="flowmask",
            max_hw=-1,
            mode="vis",
            scene_ids=["Balloon1"],
            n_src_views_spatial=3,
            n_src_views_temporal_track_one_side=n_track,
            vis_center_time=2,
            n_render_frames=8,
            vis_time_interval=2,
            vis_bt_max_disp=32,
        )

        from pgdvs_tpu.data.nvidia_vis import NvidiaVisDataset

        ours_ds = NvidiaVisDataset(
            data_root=str(scene_root),
            raw_data_dir="raw",
            depth_data_dir="depths",
            mask_data_dir="flowmask",
            flow_data_dir="flowmask",
            n_src_views_spatial=3,
            n_src_views_temporal_track_one_side=n_track,
            with_track_sources=True,
            tgt_height=FIX_H,
            vis_center_time=2,
            n_render_frames=8,
            vis_time_interval=2,
            vis_bt_max_disp=32,
        )

        assert len(ref_ds) == len(ours_ds) == 8

        for idx in range(len(ref_ds)):
            ref = ref_ds[idx]
            ours = ours_ds[idx]
            for key in VIS_KEYS:
                r = ref[key]
                if isinstance(r, torch.Tensor):
                    r = r.numpy()
                o = np.asarray(ours[key])
                assert r.shape == o.shape, f"[{idx}] {key}: {r.shape} vs {o.shape}"
                np.testing.assert_allclose(
                    o, r, rtol=1e-4, atol=1e-4, err_msg=f"[item {idx}] {key}"
                )
            for rk, ok in VIS_TRACK_FWD.items():
                r = ref[rk]
                if isinstance(r, torch.Tensor):
                    r = r.numpy()
                np.testing.assert_allclose(
                    np.asarray(ours[ok]), r, rtol=1e-4, atol=1e-4,
                    err_msg=f"[item {idx}] {rk}",
                )
            for rk, ok in VIS_TRACK_BWD.items():
                r = ref[rk]
                if isinstance(r, torch.Tensor):
                    r = r.numpy()
                # drop the quirk slot 0 (== temporal[1]) and re-pad with it
                r = np.concatenate(
                    [r[1:]] + [r[:1]] * (n_track - (r.shape[0] - 1)), axis=0
                )
                np.testing.assert_allclose(
                    np.asarray(ours[ok]), r, rtol=1e-4, atol=1e-4,
                    err_msg=f"[item {idx}] {rk}",
                )
    finally:
        ref_mod.TGT_HEIGHT, ref_vis_mod.TGT_HEIGHT = orig


@pytest.fixture(scope="module")
def mono_root(tmp_path_factory):
    """In-the-wild mono layout: rgbs/ poses/ depths/ masks/final/ flows/."""
    import jax
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(41)
    root = tmp_path_factory.mktemp("mono_ab")
    h, w, n = 32, 40, 6
    scene = root / "lady-running"
    for sub in ("rgbs", "poses", "depths", "masks/final", "flows/interval_1"):
        (scene / sub).mkdir(parents=True)

    k4 = np.eye(4)
    k4[0, 0] = k4[1, 1] = 35.0
    k4[0, 2], k4[1, 2] = w / 2, h / 2
    for i in range(n):
        name = f"{i:05d}"
        c2w = np.eye(4)
        # non-identical rotations (the reference slerp theta==0 path is
        # broken) and generic translations
        c2w[:3, :3] = Rotation.from_rotvec(
            0.02 * rng.uniform(-1, 1, 3)
        ).as_matrix()
        c2w[:3, 3] = [0.05 * i + 0.01 * rng.uniform(), -0.02 * i, 0.01 * i]
        np.savez(scene / "poses" / f"{name}.npz", K=k4, c2w=c2w)
        rgb = rng.integers(0, 255, (h, w, 3), np.uint8)
        PIL.Image.fromarray(rgb).save(scene / "rgbs" / f"{name}.png")
        small = rng.uniform(2.0, 5.0, (h // 4, w // 4))
        depth = np.asarray(
            jax.image.resize(jnp.asarray(small, jnp.float32), (h, w), "linear")
        )
        np.savez(scene / "depths" / f"{name}.npz", depth=depth)
        PIL.Image.fromarray(rng.uniform(size=(h, w)) > 0.75).save(
            scene / "masks/final" / f"{name}_final.png"
        )
    for i in range(n - 1):
        for a, b in ((i, i + 1), (i + 1, i)):
            np.savez(
                scene / "flows/interval_1" / f"{a:05d}_{b:05d}.npz",
                flow=rng.uniform(-2, 2, (h, w, 2)).astype(np.float32),
                coord_diff=rng.uniform(-1.5, 1.5, (h, w, 2)).astype(np.float32),
            )
    return root


def test_mono_vis_dataset_matches_reference(mono_root):
    torch, _ = _import_reference()
    if not hasattr(np, "mat"):
        np.mat = np.asmatrix
    try:
        from pgdvs.datasets.mono_vis import MonoVisualizationDataset
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference mono_vis unavailable: {e}")

    n_track = 2
    ref_ds = MonoVisualizationDataset(
        data_root=str(mono_root),
        max_hw=-1,
        mode="vis",
        scene_ids=["lady-running"],
        n_src_views_spatial=3,
        n_src_views_temporal_track_one_side=n_track,
        vis_center_time=2,
        n_render_frames=8,
        vis_time_interval=2,
        vis_bt_max_disp=32,
    )

    from pgdvs_tpu.data.mono_vis import MonoVisDataset

    ours_ds = MonoVisDataset(
        data_root=str(mono_root),
        scene_ids=["lady-running"],
        n_src_views_spatial=3,
        n_src_views_temporal_track_one_side=n_track,
        with_track_sources=True,
        vis_center_time=2,
        n_render_frames=8,
        vis_time_interval=2,
        vis_bt_max_disp=32,
    )

    assert len(ref_ds) == len(ours_ds) == 8

    for idx in range(len(ref_ds)):
        ref = ref_ds[idx]
        ours = ours_ds[idx]
        for key in VIS_KEYS:
            if key not in ref:
                continue
            r = ref[key]
            if isinstance(r, torch.Tensor):
                r = r.numpy()
            o = np.asarray(ours[key])
            assert r.shape == o.shape, f"[{idx}] {key}: {r.shape} vs {o.shape}"
            np.testing.assert_allclose(
                o, r, rtol=1e-4, atol=1e-4, err_msg=f"[item {idx}] {key}"
            )
        for rk, ok in VIS_TRACK_FWD.items():
            r = ref[rk]
            if isinstance(r, torch.Tensor):
                r = r.numpy()
            np.testing.assert_allclose(
                np.asarray(ours[ok]), r, rtol=1e-4, atol=1e-4,
                err_msg=f"[item {idx}] {rk}",
            )
        for rk, ok in VIS_TRACK_BWD.items():
            r = ref[rk]
            if isinstance(r, torch.Tensor):
                r = r.numpy()
            r = np.concatenate(
                [r[1:]] + [r[:1]] * (n_track - (r.shape[0] - 1)), axis=0
            )
            np.testing.assert_allclose(
                np.asarray(ours[ok]), r, rtol=1e-4, atol=1e-4,
                err_msg=f"[item {idx}] {rk}",
            )

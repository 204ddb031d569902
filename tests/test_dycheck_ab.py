"""DyCheck iPhone dataset A/B vs the REFERENCE reader.

Writes a small capture in the DyCheck iPhone on-disk format (scene/
dataset/metadata/extra jsons, per-frame camera jsons, factor-2 rgb/depth/
covisible, preprocessed dynamic masks) and asserts the reference
``DyCheckiPhoneEvaluationDataset`` (``/root/reference/pgdvs/datasets/
dycheck_iphone_eval.py`` + ``dycheck_utils.py``) and our
``DyCheckIPhoneEvalDataset`` agree on every shared contract key: camera
normalization (rescale/translate/rescale), same-time temporal selection,
KMeans-clustered spatial selection, the per-pixel depth range pinned to
projected static depths (truncated pixel coords), covisible eval masks,
and the track-source windows.

Slot-layout note: the reference right-aligns the actual frames of the fwd
track window (unlike its own NVIDIA reader); this port's canonical layout
is left-aligned, so the comparison rolls the reference's fwd arrays.
"""

import json
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

H, W = 30, 24  # factor-2 (processed) resolution
FACTOR = 2
N_TRAIN = 8
N_SPATIAL = 3
N_TRACK = 2
SCENE = "paper-windmill"


def _stub_missing_deps():
    for name in ("hydra", "hydra.utils", "cupy", "trimesh",
                 "pgdvs.utils.vis_utils"):
        if name not in sys.modules:
            sys.modules[name] = _stub_module(name)
    sys.modules["hydra"].utils = sys.modules["hydra.utils"]
    sys.modules["pgdvs.utils.vis_utils"].draw_cam_mesh = lambda *a, **k: None
    if hasattr(sys.modules.get("cupy"), "__spec__") and not hasattr(
        sys.modules["cupy"], "ndarray"
    ):
        sys.modules["cupy"].ndarray = type("ndarray", (), {})
    sys.modules["trimesh"].PointCloud = None


def _import_reference():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _stub_missing_deps()
    orig_mkdir = pathlib.Path.mkdir
    pathlib.Path.mkdir = lambda self, *a, **k: None
    try:
        from pgdvs.datasets.dycheck_iphone_eval import (
            DyCheckiPhoneEvaluationDataset,
        )
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference dycheck modules unavailable: {e}")
    finally:
        pathlib.Path.mkdir = orig_mkdir
    return torch, DyCheckiPhoneEvaluationDataset


def _write_camera(path, rng, i):
    """Full-resolution camera json (the parser rescales by 1/factor)."""
    ang = 0.05 * i + 0.01 * rng.uniform()
    ca, sa = np.cos(ang), np.sin(ang)
    orientation = np.array(
        [[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], np.float64
    )
    position = [0.1 * i + 0.02 * rng.uniform(), -0.05 * i, -1.0 + 0.03 * i]
    cam = {
        "orientation": orientation.tolist(),
        "position": position,
        "focal_length": 2 * 28.0 + i,
        "principal_point": [W * FACTOR / 2 + 0.3, H * FACTOR / 2 - 0.2],
        "image_size": [W * FACTOR, H * FACTOR],
        "skew": 0.0,
        "pixel_aspect_ratio": 1.0,
        "radial_distortion": [0.0, 0.0, 0.0],
        "tangential_distortion": [0.0, 0.0],
    }
    with open(path, "w") as f:
        json.dump(cam, f)


@pytest.fixture(scope="module")
def iphone_root(tmp_path_factory):
    rng = np.random.default_rng(31)
    root = tmp_path_factory.mktemp("dycheck_ab")
    scene = root / "raw" / SCENE
    for sub in ("splits", "camera", f"rgb/{FACTOR}x", f"depth/{FACTOR}x",
                f"covisible/{FACTOR}x/val"):
        (scene / sub).mkdir(parents=True)
    mask_dir = root / "masks" / SCENE / "masks" / "final"
    mask_dir.mkdir(parents=True)

    # train: camera 0 at times 0..7; val: camera 1 at times {1, 4, 8}
    train = [(t, 0) for t in range(N_TRAIN)]
    val = [(1, 1), (4, 1), (8, 1)]
    frames = train + val
    names = [f"{c}_{t:05d}" for t, c in frames]

    with open(scene / "scene.json", "w") as f:
        json.dump({"center": [0.05, -0.02, 0.4], "scale": 0.5,
                   "near": 0.01, "far": 8.0}, f)
    with open(scene / "dataset.json", "w") as f:
        json.dump({"count": len(frames), "ids": names}, f)
    with open(scene / "metadata.json", "w") as f:
        json.dump(
            {n: {"warp_id": t, "camera_id": c, "appearance_id": t}
             for n, (t, c) in zip(names, frames)}, f)
    with open(scene / "extra.json", "w") as f:
        json.dump({"factor": FACTOR, "fps": 30,
                   "bbox": [[-1, -1, -1], [1, 1, 1]],
                   "lookat": [0, 0, 0], "up": [0, 1, 0]}, f)
    with open(scene / "splits" / "train.json", "w") as f:
        json.dump({"frame_names": [names[i] for i in range(N_TRAIN)],
                   "time_ids": [t for t, _ in train],
                   "camera_ids": [c for _, c in train]}, f)
    with open(scene / "splits" / "val.json", "w") as f:
        json.dump({"frame_names": [names[N_TRAIN + i] for i in range(len(val))],
                   "time_ids": [t for t, _ in val],
                   "camera_ids": [c for _, c in val]}, f)

    for n, (t, c) in zip(names, frames):
        _write_camera(scene / "camera" / f"{n}.json", rng, t + 10 * c)
        rgb = rng.integers(0, 255, (H, W, 3), np.uint8)
        PIL.Image.fromarray(rgb).save(scene / f"rgb/{FACTOR}x" / f"{n}.png")
        depth = rng.uniform(1.0, 6.0, (H, W, 1)).astype(np.float32)
        np.save(scene / f"depth/{FACTOR}x" / f"{n}.npy", depth)
        if c == 0:  # train frames need dynamic masks (source views)
            # bool-mode PNGs like the real combine_masks output: the
            # reference reads mask values UNNORMALIZED (no >0 threshold),
            # so 0/255-valued masks would scale its dyn_rgb by 255
            m = rng.uniform(size=(H, W)) > 0.7
            PIL.Image.fromarray(m).save(mask_dir / f"{n}_final.png")
        else:  # val frames need covisible masks
            m = (rng.uniform(size=(H, W)) > 0.3).astype(np.uint8) * 255
            PIL.Image.fromarray(m).save(
                scene / f"covisible/{FACTOR}x/val" / f"{n}.png"
            )
    return root


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
}


def test_dycheck_dataset_matches_reference(iphone_root):
    torch, RefDataset = _import_reference()

    ref_ds = RefDataset(
        data_root=str(iphone_root),
        raw_data_dir="raw",
        mask_data_dir="masks",
        flow_data_dir="masks",
        max_hw=-1,
        mode="eval",
        scene_ids=[SCENE],
        n_src_views_spatial=N_SPATIAL,
        n_src_views_temporal_track_one_side=N_TRACK,
    )

    from pgdvs_tpu.data.dycheck_iphone import DyCheckIPhoneEvalDataset

    ours_ds = DyCheckIPhoneEvalDataset(
        data_root=str(iphone_root / "raw"),
        scene_ids=[SCENE],
        n_src_views_spatial=N_SPATIAL,
        mask_data_dir=str(iphone_root / "masks"),
        n_src_views_temporal_track_one_side=N_TRACK,
        with_track_sources=True,
    )

    assert len(ref_ds) == len(ours_ds) == 3

    for idx in range(len(ref_ds)):
        ref = ref_ds[idx]
        ours = ours_ds[idx]
        assert ref["misc"]["tgt_frame_name"] == ours["misc"]["tgt_frame_name"]
        assert int(ref["n_actual_temporal"][0]) == (
            ours["misc"]["n_actual_temporal"]
        )
        # sane fwd-window size (the reference's intended numpy-1.x
        # semantics): under numpy>=2 its uint32 time ids underflow in
        # `t0 - K` and arange returns a wrapped bogus list, inflating its
        # n_actual to K whenever t0 - K < 0 — slot contents are unaffected
        # (bogus entries fail the membership check and keep the fill value)
        t0 = int(ref["time_src_temporal"].numpy()[0])
        n_fwd = int(ours["n_actual_src_track_fwd"][0])
        ref_n_fwd = int(ref["n_actual_temporal_track_fwd2tgt"][0])
        if t0 - N_TRACK >= 0:
            assert ref_n_fwd == n_fwd
        else:
            assert ref_n_fwd == N_TRACK  # the documented uint32 artifact
        assert int(ref["n_actual_temporal_track_bwd2tgt"][0]) == int(
            ours["n_actual_src_track_bwd"][0]
        )

        for ref_key, our_key in KEY_MAP.items():
            r = ref[ref_key]
            if isinstance(r, torch.Tensor):
                r = r.numpy()
            o = np.asarray(ours[our_key or ref_key])
            if "track_fwd" in ref_key and r.ndim >= 1 and r.shape[0] == N_TRACK:
                # reference right-aligns actual fwd frames; ours left-aligns
                r = np.roll(r, -(N_TRACK - n_fwd), axis=0)
            assert r.shape == o.shape, (
                f"[{idx}] {ref_key}: {r.shape} vs {o.shape}"
            )
            np.testing.assert_allclose(
                o, r, rtol=1e-5, atol=1e-5,
                err_msg=f"[item {idx}] key {ref_key}",
            )


def test_run_benchmark_cli_dycheck(iphone_root, tmp_path):
    """`run.py benchmark --dataset-family dycheck_iphone` end-to-end on the
    fake iPhone capture: renders a val item and reports the covisible
    protocol (mpsnr/mssim), like the reference's iphone benchmark lane
    (scripts/benchmark.sh iphone)."""
    import os
    import subprocess

    out_dir = tmp_path / "bench_out"
    cmd = [
        sys.executable,
        str(pathlib.Path(__file__).parent.parent / "run.py"),
        "benchmark",
        "--benchmark-type", "default",
        "--dataset-family", "dycheck_iphone",
        "--data-root", str(iphone_root / "raw"),
        "--scene-ids", SCENE,
        "--dataset-arg", "factor=2", "n_src_views_spatial=2",
        f"mask_data_dir={iphone_root / 'masks'}",
        "--max-items", "1",
        "--out-dir", str(out_dir),
        "--render-cfg", "n_coarse_samples_per_ray=8", "ray_tile=180",
        "knn_tile=256",
    ]
    env = dict(os.environ)
    env["PGDVS_PLATFORM"] = "cpu"
    res = subprocess.run(
        cmd, capture_output=True, text=True, env=env, timeout=600
    )
    assert res.returncode == 0, res.stderr[-3000:]
    summary = json.loads((out_dir / "summary.json").read_text())
    assert summary["count"] == 1
    assert "mpsnr" in summary["mean"] and "mssim" in summary["mean"]


test_run_benchmark_cli_dycheck = pytest.mark.slow(test_run_benchmark_cli_dycheck)


def test_dycheck_extract_matches_reference(iphone_root, tmp_path):
    """`dycheck_extract` writes the same artifacts as the reference's
    dycheck_mono_info_extractor on the fake capture: raw-uint8 rgbs,
    scene-scaled depths, normalized-world K/w2c stacks."""
    _, iPhoneParserRef = _import_reference_iphone_parser()
    from pgdvs_tpu.preprocess.dycheck_extract import extract_scene

    n = extract_scene(iphone_root / "raw", tmp_path / "ours", SCENE,
                      factor=FACTOR)
    assert n == N_TRAIN

    ref_parser = iPhoneParserRef(SCENE, data_root=str(iphone_root / "raw"))
    names, time_ids, cam_ids = (
        ref_parser.load_split("train")
    )
    ours = tmp_path / "ours" / SCENE
    cams = np.load(ours / "camera.npz")
    assert cams["all_K"].shape == (N_TRAIN, 3, 3)
    assert cams["all_w2c"].shape == (N_TRAIN, 4, 4)
    for i, (name, t, c) in enumerate(zip(names, time_ids, cam_ids)):
        rgb_ref = ref_parser.load_rgba(t, c)[..., :3]
        rgb_got = np.array(PIL.Image.open(ours / "rgbs" / f"{name}.png"))
        np.testing.assert_array_equal(rgb_got, rgb_ref)
        d_ref = ref_parser.load_depth(t, c)[..., 0]
        d_got = np.load(ours / "depths" / f"{name}.npy")
        np.testing.assert_allclose(d_got, d_ref, rtol=1e-6)
        cam = ref_parser.load_camera(t, c)
        np.testing.assert_allclose(cams["all_K"][i], cam.intrin, atol=1e-5)
        np.testing.assert_allclose(cams["all_w2c"][i], cam.extrin, atol=1e-5)


def _import_reference_iphone_parser():
    mod = _import_reference()
    from pgdvs.datasets.dycheck_utils import iPhoneParser as RefParser

    return mod, RefParser

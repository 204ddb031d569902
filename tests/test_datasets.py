"""Dataset integration tests: write a synthetic scene to disk in the exact
NVIDIA on-disk layout, read it back through the dataset classes, validate the
contract, and render end-to-end from it."""

import pathlib

import numpy as np
import PIL.Image
import pytest

from pgdvs_tpu.data import synthetic
from pgdvs_tpu.data.nvidia_eval import N_CAMS, NvidiaEvalDataset

H, W = 48, 64
N_FRAMES = 6


@pytest.fixture(scope="module")
def fake_scene(tmp_path_factory):
    """Synthesize a Balloon1-like scene directory from the analytic scene."""
    return build_fake_scene(tmp_path_factory.mktemp("nvidia_data"))


def build_fake_scene(root, pose_jitter=0.0):
    """Write the analytic scene to ``root`` in the exact NVIDIA on-disk
    layout (also used by test_dataset_ab.py to drive the REFERENCE reader).

    ``pose_jitter`` adds deterministic per-frame translation offsets: the
    default camera path is symmetric (y(i) == y(n-i)), which creates
    zero-baseline camera pairs whose projections sit exactly on pixel
    centers — an f32 knife edge for the pure-geo coverage truncation."""
    scene = "Balloon1"
    dense = root / "raw" / scene / "dense"
    (dense / "mv_images").mkdir(parents=True)
    (dense / "mv_masks").mkdir()
    depth_dir = root / "depths" / scene / "disp"
    depth_dir.mkdir(parents=True)
    mask_dir = root / "flowmask" / scene / "dense/masks/final"
    mask_dir.mkdir(parents=True)
    flow_dirs = {}
    for interval in (1, 2):
        flow_dirs[interval] = (
            root / "flowmask" / scene / f"dense/flows/interval_{interval}"
        )
        flow_dirs[interval].mkdir(parents=True)

    k = synthetic.intrinsics(H, W)
    times = np.linspace(0.0, 1.0, N_FRAMES)
    poses = [synthetic.camera_pose(i, N_FRAMES) for i in range(N_FRAMES)]
    if pose_jitter:
        from scipy.spatial.transform import Rotation

        rng_p = np.random.default_rng(77)
        for p in poses:
            p[:2, 3] += pose_jitter * rng_p.uniform(-1, 1, 2)
            # tiny rotations too: identical rotations hit a broken
            # theta==0 path in the reference's quaternion slerp, which
            # real capture poses never trigger
            p[:3, :3] = Rotation.from_rotvec(
                pose_jitter * rng_p.uniform(-1, 1, 3)
            ).as_matrix()
    frames = [
        synthetic.render_frame(H, W, poses[i], times[i]) for i in range(N_FRAMES)
    ]

    # poses_bounds_cvd.npy: invert the loader's conventions
    # OpenCV c2w -> LLFF [down, right, back] stored rows
    rows = []
    for i in range(N_FRAMES):
        c2w = poses[i].copy()
        c2w[..., 1:3] *= -1  # opencv -> [right, up, back]
        m = c2w[:3, :4]
        # [right, up, back] -> [down, right, back] (inverse of loader concat)
        llff = np.concatenate([-m[:, 1:2], m[:, 0:1], m[:, 2:4]], axis=1)
        hwf = np.array([[H], [W], [k[0, 0]]])
        rows.append(np.concatenate([llff, hwf], axis=1).ravel().tolist() + [0.1, 10.0])
    np.save(dense / "poses_bounds_cvd.npy", np.asarray(rows))

    # mono video dir at eval resolution (required by the reference pure-geo
    # aggregation, nvidia_eval_pure_geo.py:184-191)
    mono_dir = dense / f"images_{W}x{H}"
    mono_dir.mkdir()

    for i in range(N_FRAMES):
        frame_dir = dense / "mv_images" / f"{i:05d}"
        frame_dir.mkdir()
        mask_frame_dir = dense / "mv_masks" / f"{i:05d}"
        mask_frame_dir.mkdir()
        f = frames[i]
        # mono camera for frame i is cam i%12; write that image (+ one other
        # viewpoint rendered from the same scene for a multi-cam target)
        # rig "cameras" are the stored poses; with N_FRAMES < 12 the mono
        # camera for frame i is simply pose i, plus one extra viewpoint
        for cam in {i % N_CAMS, (i + 1) % N_FRAMES}:
            fr = synthetic.render_frame(H, W, poses[cam], times[i])
            # .jpg like the real DynIBaR data: the reference vis reader
            # hardcodes the extension (nvidia_vis.py:666)
            PIL.Image.fromarray((fr["rgb"] * 255).astype(np.uint8)).save(
                frame_dir / f"cam{cam + 1:02d}.jpg", quality=95
            )
            PIL.Image.fromarray(
                (fr["dyn_mask"][..., 0] * 255).astype(np.uint8)
            ).save(mask_frame_dir / f"cam{cam + 1:02d}.png")
        PIL.Image.fromarray((f["rgb"] * 255).astype(np.uint8)).save(
            mono_dir / f"{i:05d}.png"
        )
        # 0.1% depth jitter: the analytic planar scene + translation-only rig
        # otherwise projects points EXACTLY onto pixel centers, putting the
        # pure-geo coverage truncation (astype(int)) on an f32 knife edge
        jit = 1.0 + 1e-3 * np.random.default_rng(100 + i).uniform(
            -1, 1, f["depth"].shape[:2]
        )
        np.save(depth_dir / f"{i:05d}.npy", 1.0 / (f["depth"][..., 0] * jit))
        PIL.Image.fromarray((f["dyn_mask"][..., 0] > 0)).save(
            mask_dir / f"{i:05d}_final.png"
        )
    for interval in (1, 2):
        for i in range(N_FRAMES - interval):
            for a, b in ((i, i + interval), (i + interval, i)):
                fa = frames[a]
                flow = synthetic.flow_between(
                    H, W, fa, poses[a], times[a], poses[b], times[b]
                )
                np.savez(
                    flow_dirs[interval] / f"{a:05d}_{b:05d}.npz",
                    flow=flow,
                    coord_diff=np.zeros((H, W, 2), np.float32),
                )
    return root


def test_nvidia_dataset_contract(fake_scene):
    ds = NvidiaEvalDataset(
        data_root=str(fake_scene),
        raw_data_dir="raw",
        depth_data_dir="depths",
        mask_data_dir="flowmask",
        flow_data_dir="flowmask",
        n_src_views_spatial=3,
        with_track_sources=True,
        tgt_height=H,
    )
    assert len(ds) > 0
    data = ds[1]
    h, w = data["rgb_tgt"].shape[:2]
    assert data["rgb_src_spatial"].shape == (3, h, w, 3)
    assert data["rgb_src_temporal"].shape == (2, h, w, 3)
    assert data["flat_cam_tgt"].shape == (34,)
    assert data["depth_range"].shape == (2,)
    assert data["depth_range"][0] > 0
    assert data["depth_range"][1] > data["depth_range"][0]
    assert data["flow_fwd"].shape == (h, w, 2)
    assert data["rgb_src_track_fwd"].shape[0] == 5
    assert np.isfinite(data["depth_src_temporal"]).all()
    # depth range must bracket the actual scene depths (~3..6)
    assert data["depth_range"][0] < synthetic.Z_DYN
    assert data["depth_range"][1] > synthetic.Z_BG * 0.9


def test_nvidia_dataset_poses_roundtrip(fake_scene):
    """Camera written in LLFF convention must load back as the OpenCV pose."""
    ds = NvidiaEvalDataset(
        data_root=str(fake_scene),
        raw_data_dir="raw",
        depth_data_dir="depths",
        mask_data_dir="flowmask",
        flow_data_dir="flowmask",
        n_src_views_spatial=3,
        tgt_height=H,
    )
    _, all_c2w, _ = ds._cams("Balloon1")
    for i in range(N_FRAMES):
        np.testing.assert_allclose(
            all_c2w[i], synthetic.camera_pose(i, N_FRAMES), atol=1e-5
        )


def test_dataset_feeds_renderer(fake_scene):
    """Full pipeline: disk -> dataset -> dynamic render reconstructs GT."""
    import jax
    import jax.numpy as jnp

    from pgdvs_tpu.renderers.config import RenderConfig
    from pgdvs_tpu.renderers.dynamic import render_dynamic

    ds = NvidiaEvalDataset(
        data_root=str(fake_scene),
        raw_data_dir="raw",
        depth_data_dir="depths",
        mask_data_dir="flowmask",
        flow_data_dir="flowmask",
        n_src_views_spatial=3,
        tgt_height=H,
    )
    # pick an in-mono item with both temporal neighbors
    data = None
    for d in ds:
        if (
            d["misc"]["tgt_frame_id"] % N_CAMS == d["misc"]["tgt_cam_id"]
            and d["misc"]["n_actual_temporal"] == 2
        ):
            data = d
            break
    assert data is not None
    dev = {k: jnp.asarray(v) for k, v in data.items() if not isinstance(v, (dict, str))}
    out = render_dynamic(dev, RenderConfig(knn_tile=512), jax.random.PRNGKey(0))
    mask = np.asarray(out["mask"])
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert mask.sum() > 20  # dynamic square reprojected into the target


def test_zip_reader_roundtrip(tmp_path):
    """Lazy zip reader: image/npz/npy round trips + pickling drops handle."""
    import io
    import pickle
    import zipfile

    import numpy as np
    import PIL.Image

    from pgdvs_tpu.data.base import ZipReader

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (8, 10, 3)).astype(np.uint8)
    arr = rng.normal(size=(4, 5)).astype(np.float32)

    zpath = tmp_path / "data.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        buf = io.BytesIO()
        PIL.Image.fromarray(img).save(buf, format="PNG")
        zf.writestr("scene/img.png", buf.getvalue())
        buf = io.BytesIO()
        np.savez(buf, flow=arr)
        zf.writestr("scene/f.npz", buf.getvalue())
        buf = io.BytesIO()
        np.save(buf, arr)
        zf.writestr("scene/a.npy", buf.getvalue())

    zr = ZipReader(zpath)
    np.testing.assert_array_equal(zr.read_image("scene/img.png"), img)
    np.testing.assert_array_equal(zr.read_npz("scene/f.npz")["flow"], arr)
    np.testing.assert_array_equal(zr.read_npy("scene/a.npy"), arr)
    assert zr.exists("scene/img.png") and not zr.exists("nope")

    zr2 = pickle.loads(pickle.dumps(zr))  # worker handoff
    np.testing.assert_array_equal(zr2.read_npy("scene/a.npy"), arr)


def test_modify_k_wrt_crop_matches_reference_math():
    import numpy as np

    from pgdvs_tpu.data.base import center_crop, modify_K_wrt_crop

    raw_h, raw_w = 96, 128
    k = np.array(
        [[100.0 / raw_w, 0, 64.0 / raw_w], [0, 100.0 / raw_h, 48.0 / raw_h],
         [0, 0, 1]]
    )
    img = np.zeros((raw_h, raw_w, 3))
    crop, info = center_crop(img, 64, 64)
    assert crop.shape[:2] == (64, 64)
    k2 = modify_K_wrt_crop(
        k, (raw_h, raw_w), (info["h_start"], info["w_start"]), (64, 64)
    )
    # denormalized focal unchanged; principal point shifted by crop start
    assert np.isclose(k2[0, 0] * 64, 100.0)
    assert np.isclose(k2[1, 1] * 64, 100.0)
    assert np.isclose(k2[0, 2] * 64, 64.0 - info["w_start"])
    assert np.isclose(k2[1, 2] * 64, 48.0 - info["h_start"])


def test_sort_poses_dist_methods():
    """All four reference dist methods produce sane rankings
    (base.py:413-474)."""
    import numpy as np

    from pgdvs_tpu.core.geometry import sort_poses_wrt_ref

    rng = np.random.default_rng(1)

    def pose(t, angle):
        c, s = np.cos(angle), np.sin(angle)
        m = np.eye(4)
        m[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        m[:3, 3] = t
        return m

    ref = pose([0, 0, 0], 0.0)
    poses = np.stack(
        [pose([0.1 * i, 0, 0], 0.05 * i) for i in range(1, 6)]
    )
    for method in ("dist", "vector", "matrix", "dist_matrix"):
        order = sort_poses_wrt_ref(
            ref, poses, metric=method, scene_center=(0, 0, -5.0)
        )
        assert list(order) == [0, 1, 2, 3, 4], (method, order)

    # tgt_id exclusion pushes the target to the end
    order = sort_poses_wrt_ref(ref, poses, metric="dist", tgt_id=0)
    assert order[-1] == 0

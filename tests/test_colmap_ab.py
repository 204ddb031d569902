"""COLMAP-converter A/B vs the REFERENCE ``convert_colmap_output.py``.

Writes one synthetic COLMAP sparse binary model, runs the reference's
``load_colmap_data`` (``/root/reference/pgdvs/preprocess/convert_colmap_output.py:47``)
and the rebuild's ``colmap_to_poses_scene`` on it, and asserts the saved
``poses.npy`` / ``scene.json`` artifacts agree bit-for-bit (f64 math on both
sides, so tolerances are machine-eps scale).
"""

import json
import struct
import sys

import numpy as np
import pytest

REF = "/root/reference"


def _quat_wxyz(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return q


def write_colmap_model(sparse_dir, rng, n_images=5, n_points=80):
    sparse_dir.mkdir(parents=True, exist_ok=True)

    with open(sparse_dir / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 96, 64))  # PINHOLE
        f.write(struct.pack("<dddd", 80.0, 80.0, 48.0, 32.0))

    pts = rng.normal(size=(n_points, 3)) * np.array([2.0, 1.5, 1.0]) + np.array(
        [0.0, 0.0, 6.0]
    )

    with open(sparse_dir / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            # deliberately shuffled ids/names: the converter must sort by name
            img_id = 100 - i
            name = f"frame_{(i * 3) % n_images:04d}.png"
            qvec = _quat_wxyz(rng)
            tvec = rng.normal(size=3) * 0.3
            vis = rng.choice(n_points, size=12, replace=False)
            f.write(struct.pack("<i", img_id))
            f.write(struct.pack("<dddd", *qvec))
            f.write(struct.pack("<ddd", *tvec))
            f.write(struct.pack("<i", 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", len(vis) + 2))
            for p in vis:
                f.write(struct.pack("<ddq", 1.0, 2.0, int(p) + 1))
            # two unmatched 2D observations (id -1) — must be skipped
            f.write(struct.pack("<ddq", 3.0, 4.0, -1))
            f.write(struct.pack("<ddq", 5.0, 6.0, -1))

    with open(sparse_dir / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", n_points))
        for p in range(n_points):
            f.write(struct.pack("<Q", p + 1))
            f.write(struct.pack("<ddd", *pts[p]))
            f.write(struct.pack("<BBB", 10, 20, 30))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 100, 0))


def _run_reference(realdir, save_dir):
    pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from pgdvs.preprocess.convert_colmap_output import load_colmap_data

    save_dir.mkdir(parents=True, exist_ok=True)
    load_colmap_data(str(realdir), save_dir)
    poses = np.load(save_dir / "poses.npy")
    with open(save_dir / "scene.json") as f:
        scene = json.load(f)
    return poses, scene


def test_colmap_to_poses_scene_matches_reference(tmp_path):
    rng = np.random.default_rng(7)
    realdir = tmp_path / "colmap"
    write_colmap_model(realdir / "sparse", rng)

    ref_poses, ref_scene = _run_reference(realdir, tmp_path / "ref_out")

    from pgdvs_tpu.preprocess.colmap_reader import colmap_to_poses_scene

    poses, scene = colmap_to_poses_scene(realdir / "sparse", tmp_path / "tpu_out")

    assert poses.shape == ref_poses.shape == (5, 32)
    np.testing.assert_allclose(poses, ref_poses, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(scene["scale"], ref_scene["scale"], rtol=1e-12)
    np.testing.assert_allclose(scene["center"], ref_scene["center"], rtol=1e-12)
    np.testing.assert_allclose(scene["bbox"], ref_scene["bbox"], rtol=1e-12)

    # the saved artifacts round-trip identically
    saved = np.load(tmp_path / "tpu_out" / "poses.npy")
    np.testing.assert_array_equal(saved, poses)
    with open(tmp_path / "tpu_out" / "scene.json") as f:
        saved_scene = json.load(f)
    assert saved_scene["scale"] == scene["scale"]


def test_max_images_cap(tmp_path):
    """The reference keeps only the first 1000 name-sorted images
    (convert_colmap_output.py:87-92); the cap also excludes dropped camera
    centers from the scene bbox."""
    rng = np.random.default_rng(9)
    write_colmap_model(tmp_path / "sparse", rng, n_images=7, n_points=30)

    from pgdvs_tpu.preprocess.colmap_reader import colmap_to_poses_scene

    poses, scene = colmap_to_poses_scene(tmp_path / "sparse", max_images=5)
    assert poses.shape == (5, 32)
    full, _ = colmap_to_poses_scene(tmp_path / "sparse")
    assert full.shape == (7, 32)
    np.testing.assert_allclose(poses, full[:5])
    # dropped camera centers must not enter the capped bbox: recompute it
    # independently from the kept c2w rows + the filtered point cloud
    from pgdvs_tpu.preprocess.colmap_reader import read_model

    _, _, points = read_model(tmp_path / "sparse")
    pcl = np.stack([p.xyz for p in points.values()])
    lo, hi = np.quantile(pcl, 0.025, axis=0), np.quantile(pcl, 0.975, axis=0)
    kept_pts = pcl[~(np.any(pcl < lo[None], 1) | np.any(pcl > hi[None], 1))]
    centers = poses[:, :16].reshape(-1, 4, 4)[:, :3, 3]
    allp = np.concatenate([kept_pts, centers])
    expect = np.stack([allp.min(0), allp.max(0)])
    np.testing.assert_allclose(np.asarray(scene["bbox"]), expect, rtol=1e-12)


def test_poses_row_layout(tmp_path):
    """Row = [c2w.ravel(16) | K4.ravel(16)], images sorted by name
    (convert_colmap_output.py:73-147)."""
    rng = np.random.default_rng(3)
    write_colmap_model(tmp_path / "sparse", rng, n_images=3, n_points=20)

    from pgdvs_tpu.preprocess import colmap_reader as cr

    poses, scene = cr.colmap_to_poses_scene(tmp_path / "sparse")
    cams, images, points = cr.read_model(tmp_path / "sparse")
    by_name = sorted(images.values(), key=lambda im: im.name)
    for row, im in zip(poses, by_name):
        c2w = row[:16].reshape(4, 4)
        np.testing.assert_allclose(c2w @ im.w2c, np.eye(4), atol=1e-10)
        k4 = row[16:].reshape(4, 4)
        assert k4[0, 0] == k4[1, 1] == 80.0
        assert (k4[0, 2], k4[1, 2]) == (48.0, 32.0)
    assert scene["scale"] > 0

"""CLI integration tests: run.py eval/train end-to-end on a fake on-disk scene."""

import json
import os
import subprocess
import sys
import pathlib

import pytest

pytestmark = pytest.mark.slow  # subprocess CLI e2e on a fake scene

REPO = pathlib.Path(__file__).parent.parent


def write_fake_nvidia_scene(tmp_path, h=32, w=40, n=4, scene="Balloon1"):
    """Minimal on-disk NVIDIA-layout scene (poses_bounds_cvd + mv_images +
    disp + masks + interval flows) the nvidia_eval reader accepts."""
    import numpy as np
    import PIL.Image
    from pgdvs_tpu.data import synthetic
    from pgdvs_tpu.data.nvidia_eval import N_CAMS

    dense = tmp_path / "raw" / scene / "dense"
    (dense / "mv_images").mkdir(parents=True)
    depth_dir = tmp_path / "depths" / scene / "disp"
    depth_dir.mkdir(parents=True)
    mask_dir = tmp_path / "fm" / scene / "dense/masks/final"
    mask_dir.mkdir(parents=True)
    for interval in (1, 2):
        (tmp_path / "fm" / scene / f"dense/flows/interval_{interval}").mkdir(
            parents=True
        )

    k = synthetic.intrinsics(h, w)
    times = np.linspace(0, 1, n)
    poses = [synthetic.camera_pose(i, n) for i in range(n)]
    frames = [synthetic.render_frame(h, w, poses[i], times[i]) for i in range(n)]
    rows = []
    for i in range(n):
        c2w = poses[i].copy()
        c2w[..., 1:3] *= -1
        m = c2w[:3, :4]
        llff = np.concatenate([-m[:, 1:2], m[:, 0:1], m[:, 2:4]], axis=1)
        hwf = np.array([[h], [w], [k[0, 0]]])
        rows.append(np.concatenate([llff, hwf], 1).ravel().tolist() + [0.1, 10.0])
    np.save(dense / "poses_bounds_cvd.npy", np.asarray(rows))
    for i in range(n):
        fd = dense / "mv_images" / f"{i:05d}"
        fd.mkdir()
        PIL.Image.fromarray((frames[i]["rgb"] * 255).astype(np.uint8)).save(
            fd / f"cam{(i % N_CAMS) + 1:02d}.png"
        )
        np.save(depth_dir / f"{i:05d}.npy", 1.0 / frames[i]["depth"][..., 0])
        PIL.Image.fromarray(frames[i]["dyn_mask"][..., 0] > 0).save(
            mask_dir / f"{i:05d}_final.png"
        )
    for interval in (1, 2):
        for i in range(n - interval):
            for a, b in ((i, i + interval), (i + interval, i)):
                flow = synthetic.flow_between(
                    h, w, frames[a], poses[a], times[a], poses[b], times[b]
                )
                np.savez(
                    tmp_path / "fm" / scene / f"dense/flows/interval_{interval}"
                    / f"{a:05d}_{b:05d}.npz",
                    flow=flow,
                    coord_diff=np.zeros((h, w, 2), np.float32),
                )
    return scene


DATASET_ARGS = [
    "--dataset-arg",
    "raw_data_dir=raw", "depth_data_dir=depths",
    "mask_data_dir=fm", "flow_data_dir=fm",
    "n_src_views_spatial=2", "tgt_height=32",
]


def _cpu_env():
    env = dict(os.environ)
    env["PGDVS_PLATFORM"] = "cpu"  # env JAX_PLATFORMS is ignored here
    return env


def test_run_eval_cli(tmp_path):
    scene = write_fake_nvidia_scene(tmp_path)
    out_dir = tmp_path / "out"
    cmd = [
        sys.executable,
        str(REPO / "run.py"),
        "eval",
        "--dataset", "nvidia_eval",
        "--data-root", str(tmp_path),
        *DATASET_ARGS,
        "--scene-ids", scene,
        "--out-dir", str(out_dir),
        "--max-items", "1",
        "--render-cfg", "n_coarse_samples_per_ray=8", "ray_tile=320",
        "knn_tile=256",
        "--save-vis",
    ]
    res = subprocess.run(
        cmd, capture_output=True, text=True, env=_cpu_env(), timeout=500
    )
    assert res.returncode == 0, res.stderr[-3000:]
    summary = json.loads((out_dir / "summary.json").read_text())
    assert summary["count"] == 1
    assert "psnr_full" in summary["mean"]


def test_run_train_cli(tmp_path):
    """`run.py train` fine-tunes on the fake scene: finite loss, checkpoint
    written, and --resume restores it (the capability the reference's
    trainer scaffolds but leaves unimplemented, trainer_pgdvs.py:246)."""
    scene = write_fake_nvidia_scene(tmp_path)
    out_dir = tmp_path / "ckpts"
    cmd = [
        sys.executable,
        str(REPO / "run.py"),
        "train",
        "--dataset", "nvidia_eval",
        "--data-root", str(tmp_path),
        *DATASET_ARGS,
        "--scene-ids", scene,
        "--out-dir", str(out_dir),
        "--epochs", "1",
        "--n-rays", "32",
        "--render-cfg", "n_coarse_samples_per_ray=8",
    ]
    res = subprocess.run(
        cmd, capture_output=True, text=True, env=_cpu_env(), timeout=500
    )
    assert res.returncode == 0, res.stderr[-3000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    assert report["epochs"] == 1 and report["steps"] >= 1
    import math

    assert math.isfinite(report["final_epoch_loss"])
    assert any(out_dir.iterdir()), "no checkpoint written"

    # resume continues from the saved state
    res2 = subprocess.run(
        cmd + ["--resume"],
        capture_output=True, text=True, env=_cpu_env(), timeout=500,
    )
    assert res2.returncode == 0, res2.stderr[-3000:]
    report2 = json.loads(res2.stdout.strip().splitlines()[-1])
    assert report2["epochs"] == 2


def test_resume_recomposes_overrides(tmp_path):
    """Resume recompose (reference run.py:206-261 semantics): the restored
    run's saved config is the base and NEW CLI overrides apply on top —
    old non-default fields survive a resume that doesn't mention them."""
    import argparse

    sys.path.insert(0, str(REPO))
    import run as run_mod
    from pgdvs_tpu.engines.checkpoint import load_run_config, save_run_config

    # original run: two non-default fields
    args1 = argparse.Namespace(
        render_cfg=["n_coarse_samples_per_ray=8", "ray_tile=320"]
    )
    cfg1 = run_mod.build_render_config(args1)
    import dataclasses

    save_run_config(tmp_path, {"render_cfg": dataclasses.asdict(cfg1)})

    # resume with ONE new override: the new flag applies, the old ones keep
    args2 = argparse.Namespace(render_cfg=["knn_tile=256"])
    saved = load_run_config(tmp_path)
    cfg2 = run_mod.build_render_config(args2, base=saved["render_cfg"])
    assert cfg2.knn_tile == 256            # new override applied
    assert cfg2.n_coarse_samples_per_ray == 8  # restored base survives
    assert cfg2.ray_tile == 320
    # and a new override WINS over the restored base
    args3 = argparse.Namespace(render_cfg=["ray_tile=640"])
    cfg3 = run_mod.build_render_config(args3, base=saved["render_cfg"])
    assert cfg3.ray_tile == 640 and cfg3.n_coarse_samples_per_ray == 8

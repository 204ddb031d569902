"""ref_parity_compare: the mechanical diff between this framework's
per-image pickles and the reference evaluator's (both schemas synthesized
here — the real artifacts need weights/data this environment can't
provision, but the join + criterion logic is fully testable)."""

import pathlib
import pickle
import sys

import pytest  # noqa: F401

sys.path.insert(
    0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts")
)

import ref_parity_compare as rpc  # noqa: E402


def _write_ref(infos, scene, frame, cam, psnr, rank=0):
    d = infos / "train" / scene
    d.mkdir(parents=True, exist_ok=True)
    rec = {}
    for met, v in (("psnr", psnr), ("ssim", 0.9), ("lpips", 0.1)):
        for reg in ("full", "dyn", "static"):
            rec[f"{met}_{reg}_combined"] = v
    with open(d / f"{frame:05d}_cam_{cam:03d}_rank_{rank}.pkl", "wb") as f:
        pickle.dump(rec, f)


def _write_ours(out, idx, scene, frame, cam, psnr):
    rec = {"scene_id": scene, "tgt_frame_id": frame, "tgt_cam_id": cam}
    for met, v in (("psnr", psnr), ("ssim", 0.9), ("lpips", 0.1)):
        for reg in ("full", "dyn", "static"):
            rec[f"{met}_{reg}"] = v
    out.mkdir(parents=True, exist_ok=True)
    with open(out / f"{idx:06d}.pkl", "wb") as f:
        pickle.dump(rec, f)


def test_parity_pass_within_budget(tmp_path, capsys):
    ref, ours = tmp_path / "infos", tmp_path / "ours"
    for i, (fr, cam) in enumerate([(0, 1), (1, 3), (2, 5)]):
        _write_ref(ref, "Balloon1", fr, cam, 30.0)
        _write_ours(ours, i, "Balloon1", fr, cam, 30.05)  # +0.05 dB < 0.1
    rc = rpc.main(["--ref-infos", str(ref), "--ours", str(ours)])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"parity": "PASS"' in out
    assert '"n_items": 3' in out


def test_parity_fail_over_budget(tmp_path, capsys):
    ref, ours = tmp_path / "infos", tmp_path / "ours"
    _write_ref(ref, "Balloon1", 0, 1, 30.0)
    _write_ours(ours, 0, "Balloon1", 0, 1, 30.5)  # +0.5 dB > 0.1
    rc = rpc.main(["--ref-infos", str(ref), "--ours", str(ours)])
    assert rc == 1
    assert '"parity": "FAIL"' in capsys.readouterr().out


def test_parity_no_common_items(tmp_path):
    ref, ours = tmp_path / "infos", tmp_path / "ours"
    _write_ref(ref, "Balloon1", 0, 1, 30.0)
    _write_ours(ours, 0, "Jumping", 7, 2, 30.0)
    assert rpc.main(["--ref-infos", str(ref), "--ours", str(ours)]) == 2


def test_evaluator_pickles_carry_join_ids(tmp_path):
    """The Evaluator embeds scene/frame/cam ids in each pickle (the compare
    script's join keys) without polluting the summed metrics."""
    import numpy as np
    import jax

    from pgdvs_tpu.data.synthetic import make_contract_data
    from pgdvs_tpu.engines.evaluator import Evaluator
    from pgdvs_tpu.renderers.config import RenderConfig
    from pgdvs_tpu.renderers.static_gnt import (
        init_gnt_params,
        make_gnt_models,
    )

    models = make_gnt_models(dtype="float32")
    params = init_gnt_params(jax.random.PRNGKey(0), *models, n_src=3)
    data = make_contract_data(h=16, w=24, n_spatial=3, n_frames=6)
    data["misc"] = dict(
        data.get("misc") or {},
        scene_id="Balloon1", tgt_frame_id=4, tgt_cam_id=2,
    )
    cfg = RenderConfig(
        n_coarse_samples_per_ray=4, ray_tile=128, knn_tile=64,
        dyn_point_capacity=64,
    )
    ev = Evaluator(models, params, cfg, out_dir=str(tmp_path / "out"))
    summary = ev.run([data])
    assert summary["count"] == 1
    assert not any(k.endswith("_id") for k in summary["mean"])
    with open(tmp_path / "out" / "000000.pkl", "rb") as f:
        rec = pickle.load(f)
    assert rec["scene_id"] == "Balloon1"
    assert rec["tgt_frame_id"] == 4 and rec["tgt_cam_id"] == 2
    assert "psnr_full" in rec

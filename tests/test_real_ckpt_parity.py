"""Real-checkpoint quality-parity harness — skipped until weights exist.

The reference's headline artifact is a PSNR/SSIM/LPIPS table on NVIDIA
Dynamic Scenes rendered with the released GNT weights
(``/root/reference/pgdvs/engines/evaluator_pgdvs.py:190-280``,
``scripts/benchmark.sh:302-339``; weights from
``scripts/download_ckpts.sh:21-23``). Checkpoints/datasets are not
provisionable in this environment, so this module is the ONE-COMMAND
harness that turns provisioning into a parity run:

    PGDVS_CKPT_DIR=/ckpts [PGDVS_DATA_DIR=/data] \
        python -m pytest tests/test_real_ckpt_parity.py -q -m "" -s

* loads ``$PGDVS_CKPT_DIR/gnt/model_720000.pth`` through the weight port
  (``models/gnt/weight_port.py`` — structurally tested on synthetic state
  dicts in ``test_weight_port.py``);
* renders one NVIDIA-layout view — the real reader's first Balloon1 item
  when ``PGDVS_DATA_DIR`` points at the nvidia_long layout, else the
  synthetic scene at eval scale;
* writes the reference-schema per-image metric pickle
  (flat ``psnr/ssim/lpips_{full,dyn,static}`` — the ``info_dict`` layout,
  evaluator_pgdvs.py:276-278) plus a human-readable table to
  ``$PGDVS_PARITY_OUT`` (default: a tmp dir, printed).

The 3-command reference-vs-repo comparison this enables is documented in
``docs/BENCHMARK.md`` §"Quality parity".
"""

import os
import pathlib
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _ckpt_path():
    d = os.environ.get("PGDVS_CKPT_DIR", "")
    p = pathlib.Path(d, "gnt", "model_720000.pth")
    return p if d and p.is_file() else None


@pytest.mark.skipif(
    _ckpt_path() is None,
    reason="real-weights parity needs PGDVS_CKPT_DIR/gnt/model_720000.pth "
    "(not provisionable in this environment; see module docstring)",
)
def test_real_ckpt_render_writes_reference_schema_metrics(tmp_path):
    from pgdvs_tpu.engines.evaluator import Evaluator
    from pgdvs_tpu.models.gnt.weight_port import load_gnt_checkpoint
    from pgdvs_tpu.renderers.config import RenderConfig
    from pgdvs_tpu.renderers.static_gnt import make_gnt_models

    params = load_gnt_checkpoint(str(_ckpt_path()))
    assert params is not None

    out_dir = pathlib.Path(os.environ.get("PGDVS_PARITY_OUT", tmp_path))

    data_root = os.environ.get("PGDVS_DATA_DIR")
    if data_root:
        from pgdvs_tpu.data.nvidia_eval import NvidiaEvalDataset

        ds = NvidiaEvalDataset(data_root, scene_ids=["Balloon1"])
        assert len(ds) > 0, f"no Balloon1 items under {data_root}"
        data = ds[0]
        item_id = "Balloon1_000"
        n_src = data["rgb_src_spatial"].shape[0]
    else:
        # weights are real, the frame is synthetic: still a full-resolution
        # full-protocol run through the ported weights (finite + schema)
        from pgdvs_tpu.data.synthetic import make_contract_data

        data = make_contract_data(h=288, w=550, n_spatial=10, n_frames=12)
        item_id = "synthetic_000"
        n_src = 10

    # the reference eval protocol: 256 inv-uniform coarse samples
    # (scripts/benchmark.sh:320-323); exact sampling mode for numerics
    cfg = RenderConfig(
        n_coarse_samples_per_ray=256,
        sample_inv_uniform=True,
        gnt_use_masked_spatial_src=True,
    )
    models = make_gnt_models()

    lpips_params = None
    try:
        from pgdvs_tpu.metrics.lpips_jax import load_torch_weights

        lpips_params = load_torch_weights()
    except Exception:
        pass  # alexnet backbone unavailable -> psnr/ssim-only table

    ev = Evaluator(
        models,
        params,
        cfg,
        out_dir=str(out_dir),
        lpips_params=lpips_params,
        save_vis=True,
    )
    rec = ev.eval_item(data, item_id=item_id)

    with open(out_dir / f"{item_id}.pkl", "rb") as f:
        metrics = pickle.load(f)
    for region in ("full", "dyn", "static"):
        assert f"psnr_{region}" in metrics
        assert f"ssim_{region}" in metrics
        assert np.isfinite(metrics[f"psnr_{region}"])

    table = ["| metric | full | dyn | static |", "|---|---|---|---|"]
    for m in ("psnr", "ssim", "lpips"):
        if f"{m}_full" not in metrics:
            continue
        table.append(
            f"| {m} | " + " | ".join(
                f"{metrics[f'{m}_{r}']:.4f}" for r in ("full", "dyn", "static")
            ) + " |"
        )
    (out_dir / "parity_table.md").write_text("\n".join(table) + "\n")
    print(f"\nreal-ckpt parity table ({item_id}) -> {out_dir}/parity_table.md")
    print("\n".join(table))
    assert rec.metrics["render_wall_s"] > 0

"""Mechanical quality-parity diff: this framework vs the reference evaluator.

The day real data + checkpoints are provisioned, parity is a three-command
check (VERDICT r4 item 6; criterion: |mean delta| <= 0.1 dB PSNR per
region, reported for full/dyn/static):

1. Reference side (GPU box, reference repo) — produce per-image pickles:

   bash scripts/benchmark.sh <ref_repo> <ckpt_root> <data_root> nvidia \
       '[Balloon1]' default
   # -> <hydra_out>/infos/<split>/Balloon1/{frame:05d}_cam_{cam:03d}_rank_*.pkl
   # (eval_save_individual=true is already in the bundle —
   #  reference scripts/benchmark.sh:303-339, evaluator_pgdvs.py:120-129)

2. This framework (TPU box) — same scene, same protocol:

   python run.py eval --dataset nvidia_eval --data-root <data_root> \
       --scene-ids Balloon1 --gnt-ckpt <ckpt_root>/gnt/model_720000.pth \
       --out-dir out/parity
   # -> out/parity/{item:06d}.pkl with the scene/frame/cam join ids inside
   # (use --perf-preset exact to pin the reference-faithful sampler; the
   #  fast preset is within bf16 rounding per-kernel but not bit-identical)

3. Diff (anywhere):

   python scripts/ref_parity_compare.py --ref-infos <hydra_out>/infos \
       --ours out/parity

Reference pickle schema: {psnr,ssim,lpips}_{full,dyn,static}_combined
(evaluator_pgdvs.py:259-278) keyed by filename {frame:05d}_cam_{cam:03d};
ours: {psnr,ssim,lpips}_{full,dyn,static} + scene_id/tgt_frame_id/
tgt_cam_id fields. Items are joined on (scene, frame, cam).
"""

import argparse
import json
import pathlib
import pickle
import re
import sys

REGIONS = ("full", "dyn", "static")
METRICS = ("psnr", "ssim", "lpips")
PSNR_BUDGET_DB = 0.1

_REF_FNAME = re.compile(r"^(\d{5})_cam_(\d{3})(?:_rank_\d+)?\.pkl$")


def load_reference(infos_dir: pathlib.Path):
    """{(scene, frame, cam): {metric_region: float}} from the reference's
    infos/<split>/<scene>/{frame:05d}_cam_{cam:03d}_rank_*.pkl tree."""
    out = {}
    for f in sorted(infos_dir.rglob("*.pkl")):
        m = _REF_FNAME.match(f.name)
        if not m:
            continue
        scene = f.parent.name
        with open(f, "rb") as fh:
            d = pickle.load(fh)
        rec = {}
        for met in METRICS:
            for reg in REGIONS:
                for k in (f"{met}_{reg}_combined", f"{met}_{reg}"):
                    if k in d:
                        rec[f"{met}_{reg}"] = float(d[k])
                        break
        out[(scene, int(m.group(1)), int(m.group(2)))] = rec
    return out


def load_ours(out_dir: pathlib.Path):
    out = {}
    for f in sorted(out_dir.glob("*.pkl")):
        with open(f, "rb") as fh:
            d = pickle.load(fh)
        if not all(k in d for k in ("scene_id", "tgt_frame_id", "tgt_cam_id")):
            print(f"skipping {f.name}: no join ids (pre-round-5 pickle?)",
                  file=sys.stderr)
            continue
        key = (str(d["scene_id"]), int(d["tgt_frame_id"]), int(d["tgt_cam_id"]))
        out[key] = {
            f"{met}_{reg}": float(d[f"{met}_{reg}"])
            for met in METRICS
            for reg in REGIONS
            if f"{met}_{reg}" in d
        }
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ref-infos", required=True, type=pathlib.Path)
    ap.add_argument("--ours", required=True, type=pathlib.Path)
    ap.add_argument("--psnr-budget-db", type=float, default=PSNR_BUDGET_DB)
    args = ap.parse_args(argv)

    ref = load_reference(args.ref_infos)
    ours = load_ours(args.ours)
    common = sorted(set(ref) & set(ours))
    if not common:
        print(
            f"no common items (ref {len(ref)}, ours {len(ours)}) — check the "
            "scene ids / --out-dir",
            file=sys.stderr,
        )
        return 2

    report = {"n_items": len(common), "n_ref_only": len(ref) - len(common),
              "n_ours_only": len(ours) - len(common), "deltas": {}}
    ok = True
    for met in METRICS:
        for reg in REGIONS:
            k = f"{met}_{reg}"
            pairs = [
                (ours[i][k], ref[i][k])
                for i in common
                if k in ours[i] and k in ref[i]
            ]
            if not pairs:
                continue
            deltas = [o - r for o, r in pairs]
            mean_d = sum(deltas) / len(deltas)
            max_d = max(abs(d) for d in deltas)
            report["deltas"][k] = {
                "mean": round(mean_d, 5),
                "max_abs": round(max_d, 5),
                "n": len(pairs),
            }
            if met == "psnr" and abs(mean_d) > args.psnr_budget_db:
                report["deltas"][k]["FAIL"] = (
                    f"|mean| {abs(mean_d):.4f} dB > budget "
                    f"{args.psnr_budget_db} dB"
                )
                ok = False
    report["parity"] = "PASS" if ok else "FAIL"
    print(json.dumps(report, indent=2))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

"""Optical-flow preprocessing CLI: RAFT fwd/bwd + cycle-consistency npz.

Counterpart of the reference's flow preprocessing
(``/root/reference/pgdvs/preprocess/compute_flow.py:221-380``): for every
frame pair (i, i±k) at intervals 1..N, run RAFT forward and backward (32
iterations) and write ``interval_<k>/<i:05d>_<j:05d>.npz`` with
``flow`` [H, W, 2] and ``coord_diff`` [H, W, 2] (the forward-backward
round-trip error the datasets threshold into occlusion masks —
``common.py:314-325``).

Runs the native flax RAFT (``models/flow/raft.py``) with the princeton-vl
checkpoint from ``PGDVS_CKPT_DIR``; this replaces the reference's
third-party-repo subprocess stack.
"""

from __future__ import annotations

import pathlib

import numpy as np

_IMG_EXTS = {".png", ".jpg", ".jpeg"}


def _frame_files(rgb_dir: pathlib.Path):
    return sorted(
        f for f in rgb_dir.iterdir() if f.suffix.lower() in _IMG_EXTS
    )


def compute_scene_flows(
    rgb_dir,
    save_dir,
    intervals=(1,),
    flow_fn=None,
    iters: int = 32,
    tiling: str = "none",
) -> int:
    """Compute fwd/bwd flows for all frame pairs at the given intervals.

    flow_fn: optional (img1, img2) -> (flow12, flow21) override (tests /
    alternative models); defaults to the RAFT port with the released
    checkpoint.
    tiling: 'none' runs the model at frame resolution (RAFT's protocol);
    'flowformer' runs the FlowFormer patch protocol (fixed 432x960 patches,
    Gaussian-blended overlaps, adaptive upresize for small frames —
    ``flowformer_tiling``) over whichever model flow_fn wraps.

    Returns the number of npz files written.
    """
    import PIL.Image

    rgb_dir = pathlib.Path(rgb_dir)
    save_dir = pathlib.Path(save_dir)
    if flow_fn is None:
        from pgdvs_tpu.models.flow.raft import RAFTFlow
        from pgdvs_tpu.models.flow.raft_port import load_raft_checkpoint

        params = load_raft_checkpoint()
        if params is None:
            raise FileNotFoundError(
                "RAFT checkpoint not found; set PGDVS_CKPT_DIR with "
                "raft/models/raft-things.pth"
            )
        flow_fn = RAFTFlow(params=params, iters=iters)

    if tiling == "flowformer":
        from pgdvs_tpu.preprocess.flowformer_tiling import (
            FLOWFORMER_TRAIN_SIZE,
            adaptive_flow,
            tiled_flow,
        )

        base_fn = flow_fn

        # the tiling protocol drives each direction per patch itself — use a
        # single-direction model fn when the flow model offers one instead
        # of computing (fwd, bwd) per patch and discarding half
        if hasattr(base_fn, "one_way"):
            m = base_fn.one_way
        else:
            def m(pa, pb):
                return base_fn(pa, pb)[0]

        def flow_fn(img1, img2):  # noqa: F811 — tiled wrapper
            def one_way(a, b):
                big = (
                    img1.shape[0] >= FLOWFORMER_TRAIN_SIZE[0]
                    and img1.shape[1] >= FLOWFORMER_TRAIN_SIZE[1]
                )
                return (
                    tiled_flow(m, a, b) if big else adaptive_flow(m, a, b)
                )

            return one_way(img1, img2), one_way(img2, img1)

    from pgdvs_tpu.preprocess.flow_consistency import flow_roundtrip

    files = _frame_files(rgb_dir)
    frames = [
        np.asarray(PIL.Image.open(f).convert("RGB"), np.float32) / 255.0
        for f in files
    ]
    n_written = 0
    for k in intervals:
        out_dir = save_dir / f"interval_{k}"
        out_dir.mkdir(parents=True, exist_ok=True)
        for i in range(len(frames) - k):
            j = i + k
            f12, f21 = flow_fn(frames[i], frames[j])
            f12 = np.asarray(f12, np.float32)
            f21 = np.asarray(f21, np.float32)
            cd_12 = np.asarray(flow_roundtrip(f12, f21)[0], np.float32)
            cd_21 = np.asarray(flow_roundtrip(f21, f12)[0], np.float32)
            np.savez(
                out_dir / f"{i:05d}_{j:05d}.npz", flow=f12, coord_diff=cd_12
            )
            np.savez(
                out_dir / f"{j:05d}_{i:05d}.npz", flow=f21, coord_diff=cd_21
            )
            n_written += 2
    return n_written


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rgb-dir", required=True)
    p.add_argument("--save-dir", required=True)
    p.add_argument("--intervals", type=int, nargs="*", default=[1])
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--tiling", default="none", choices=["none", "flowformer"])
    args = p.parse_args(argv)
    n = compute_scene_flows(
        args.rgb_dir, args.save_dir, intervals=args.intervals,
        iters=args.iters, tiling=args.tiling,
    )
    print(f"wrote {n} flow npz files -> {args.save_dir}")


if __name__ == "__main__":
    main()

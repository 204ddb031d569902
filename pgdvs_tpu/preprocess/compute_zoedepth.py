"""Metric mono-depth preprocessing: align predictions, write the zoe npz
layout the datasets read.

Counterpart of the reference's ZoeDepth preprocessing
(``/root/reference/pgdvs/preprocess/compute_zoedepth.py``): per frame, a
metric mono-depth prediction is aligned to COLMAP sparse/MVS depth in
disparity space (median + 80%-trimmed scale/shift, per-frame and
video-shared — ``depth_align.align_video``) and written as
``dense/zoe_depths_<type>/<frame:05d>.npz`` with ``depth_pred`` plus the
eight ``me_{med,trim}_{scale,shift}_{indiv,share}`` pairs and the ``me_*``
diagnostics the dataset's 'moe' best-of selection sorts on
(``data/nvidia_eval.py:47-52,169-191``).

The depth model is native: ``--zoe-ckpt`` runs the flax DPT-BEiT-L +
metric-bins ZoeDepth (``models/depth/dpt_beit.py``) from a released
``ZoeD_M12_*.pt`` checkpoint (key-mapped by ``models/depth/zoe_port.py``).
Alternatively ``--pred-dir`` consumes precomputed predictions (npz/npy per
frame, any ``depth``/``depth_pred``/first-array key), or callers pass
``depth_fn`` to ``compute_scene_zoe`` to run any in-process model.
"""

from __future__ import annotations

import pathlib

import numpy as np

_IMG_EXTS = {".png", ".jpg", ".jpeg"}


def _load_depth_file(f: pathlib.Path) -> np.ndarray:
    z = np.load(f)
    if hasattr(z, "files"):
        for key in ("depth_pred", "depth", "pred"):
            if key in z.files:
                return np.asarray(z[key], np.float32)
        return np.asarray(z[z.files[0]], np.float32)
    return np.asarray(z, np.float32)


def compute_scene_zoe(
    rgb_dir,
    mvs_depth_dir,
    save_dir,
    zoe_type: str = "n",
    depth_fn=None,
    pred_dir=None,
) -> int:
    """Align per-frame metric depth and write the zoe npz layout.

    Args:
      rgb_dir: frame images (defines the frame list/stems).
      mvs_depth_dir: per-frame sparse/MVS depth npz|npy (0 = missing pixel).
      save_dir: scene root; files land in ``zoe_depths_<zoe_type>/``.
      zoe_type: 'n' | 'k' | 'nk' (the variant subdirectory name).
      depth_fn: optional callable [H, W, 3] float [0,1] -> [H, W] depth.
      pred_dir: precomputed predictions directory (used when depth_fn is
        None; files matched by frame stem).

    Returns the number of frames written.
    """
    import PIL.Image

    rgb_dir = pathlib.Path(rgb_dir)
    mvs_dir = pathlib.Path(mvs_depth_dir)
    out_dir = pathlib.Path(save_dir) / f"zoe_depths_{zoe_type}"
    out_dir.mkdir(parents=True, exist_ok=True)

    from pgdvs_tpu.preprocess.depth_align import align_video

    files = sorted(
        f for f in rgb_dir.iterdir() if f.suffix.lower() in _IMG_EXTS
    )
    preds, mvs = [], []
    for f in files:
        if depth_fn is not None:
            img = np.asarray(PIL.Image.open(f).convert("RGB"), np.float32)
            preds.append(np.asarray(depth_fn(img / 255.0), np.float32))
        else:
            assert pred_dir is not None, "need depth_fn or pred_dir"
            cand = None
            for ext in (".npz", ".npy"):
                p = pathlib.Path(pred_dir) / (f.stem + ext)
                if p.is_file():
                    cand = p
                    break
            assert cand is not None, f"no prediction for {f.stem}"
            preds.append(_load_depth_file(cand))
        mvs_f = None
        for ext in (".npz", ".npy"):
            p = mvs_dir / (f.stem + ext)
            if p.is_file():
                mvs_f = p
                break
        assert mvs_f is not None, f"no MVS depth for {f.stem}"
        mvs.append(_load_depth_file(mvs_f))

    # alignment runs on the sparse VALID pixels only (mvs depth 0 = missing,
    # compute_zoedepth.py:296-330 masks to the sparse reconstruction)
    pairs = []
    for pred, m in zip(preds, mvs):
        valid = m > 0
        pairs.append((pred[valid], m[valid]))
    infos = align_video([p for p, _ in pairs], [m for _, m in pairs])
    for i, (pred, info) in enumerate(zip(preds, infos)):
        np.savez(out_dir / f"{i:05d}.npz", depth_pred=pred, **info)
    return len(files)


def make_dpt_depth_fn(zoe_ckpt: str, max_depth: float = 10.0,
                      net_hw=(384, 512), with_flip_aug: bool = True):
    """Build depth_fn running the native DPT-BEiT ZoeDepth from a released
    ``ZoeD_M12_*.pt`` (compute_zoedepth.py:146-166 contract). Both the MiDaS
    backbone AND the metric-bins head are loaded from the checkpoint (the
    variant — single N/K vs two-domain NK — is detected from its keys), and
    inference follows the reference's exact ``model.infer`` protocol
    (reflect pad, keep-aspect multiple-of-32 align-corners resize, flip
    ensembling, bicubic restore — ``models/depth/zoe_infer.py``)."""
    import jax
    import jax.numpy as jnp

    from pgdvs_tpu.models.depth.dpt_beit import ZoeDepthDPT
    from pgdvs_tpu.models.depth.zoe_infer import zoe_infer
    from pgdvs_tpu.models.depth.zoe_port import load_zoe_checkpoint

    backbone_params, head_params, variant = load_zoe_checkpoint(zoe_ckpt)
    model = ZoeDepthDPT(max_depth=max_depth, variant=variant)
    as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
    params = {"params": {"midas": as_jnp(backbone_params),
                         "head": as_jnp(head_params)}}
    apply = jax.jit(model.apply)

    def net_fn(x):  # [H', W', 3] in [0, 1] at the (multiple-of-32) net size
        return np.asarray(apply(params, jnp.asarray(x)))

    def depth_fn(img):
        return zoe_infer(net_fn, img, net_hw=net_hw,
                         with_flip_aug=with_flip_aug)

    return depth_fn


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rgb-dir", required=True)
    p.add_argument("--mvs-depth-dir", required=True)
    p.add_argument("--save-dir", required=True)
    p.add_argument("--pred-dir", default=None,
                   help="precomputed depth predictions (npz/npy per frame)")
    p.add_argument("--zoe-ckpt", default=None,
                   help="ZoeD_M12_*.pt checkpoint: run the native DPT-BEiT "
                        "ZoeDepth instead of reading --pred-dir")
    p.add_argument("--max-depth", type=float, default=10.0)
    p.add_argument("--zoe-type", default="n", choices=["n", "k", "nk"])
    args = p.parse_args(argv)
    assert args.pred_dir or args.zoe_ckpt, "need --pred-dir or --zoe-ckpt"
    depth_fn = (
        make_dpt_depth_fn(args.zoe_ckpt, max_depth=args.max_depth)
        if args.zoe_ckpt
        else None
    )
    n = compute_scene_zoe(
        args.rgb_dir, args.mvs_depth_dir, args.save_dir,
        zoe_type=args.zoe_type, pred_dir=args.pred_dir, depth_fn=depth_fn,
    )
    print(f"wrote {n} aligned depth npz -> {args.save_dir}")


if __name__ == "__main__":
    main()

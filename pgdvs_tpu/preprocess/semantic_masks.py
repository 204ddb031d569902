"""Semantic "potentially dynamic" masks: OneFormer union + SAM promotion.

Completes the mask stack of the reference's ``compute_mask.py`` semantic
mode (``/root/reference/pgdvs/preprocess/compute_mask.py:71-127,363-381,
726-761``): two OneFormer semantic segmentations (ADE20K + COCO), each
argmax'd with low-confidence pixels marked invalid, unioned over the
movable-class ID lists, then fed (with SAM everything-mode segments) into
the temporal propagation of ``combine_masks.py``.

The reference runs the detectron2/NATTEN OneFormer and facebookresearch
segment-anything — both CUDA-compiled stacks. This re-basing uses the
HuggingFace ``transformers`` implementations of the SAME architectures
(OneFormer DiNAT-L ADE20K/COCO, SAM ViT-H), which run on CPU/TPU-host
torch with identical published weights. The inference math that defines
the output contract (query-mask x class-probability aggregation,
confidence thresholding, movable-class union) is implemented here as
plain numpy/torch functions so it is unit-testable without checkpoints.

Checkpoints are resolved from the HF cache / ``PGDVS_CKPT_DIR``; in a
zero-egress environment the CLI degrades to a clear error and masks stay
precomputed inputs (SURVEY §2.3.6).
"""

from __future__ import annotations

import argparse
import pathlib
from typing import Optional, Sequence

import numpy as np

# fmt: off
# Movable-class IDs, 1-indexed exactly as the reference lists them
# (compute_mask.py:70-127; the match subtracts 1 because the seg maps are
# 0-indexed).
DYNAMIC_IDS_ADE20K = [
    13,   # person
    21,   # car
    77,   # boat
    81,   # bus
    84,   # truck
    91,   # airplane
    93,   # dress/clothes
    103,  # van
    104,  # ship
    109,  # toy
    116,  # bag
    117,  # motorbike
    118,  # cradle
    120,  # ball
    127,  # animal
    128,  # bicycle
    140,  # fan
    150,  # flag
]
DYNAMIC_IDS_COCO = [
    1,   # person
    2,   # bicycle
    3,   # car
    4,   # motorcycle
    5,   # airplane
    6,   # bus
    7,   # train
    8,   # truck
    9,   # boat
    15,  # bird
    16,  # cat
    17,  # dog
    18,  # horse
    19,  # sheep
    20,  # cow
    21,  # elephant
    22,  # bear
    23,  # zebra
    24,  # giraffe
    26,  # umbrella
    31,  # ski
    32,  # snowboard
    37,  # skateboard
    38,  # surfboard
    39,  # tennis racket
]
# fmt: on

SEM_SEG_PROB_THRES = 0.1  # compute_mask.py:137


def semantic_scores_from_queries(
    class_queries_logits: np.ndarray,
    masks_queries_logits: np.ndarray,
) -> np.ndarray:
    """Per-pixel class scores from query decompositions.

    The MaskFormer-family semantic inference (OneFormer inherits it):
    softmax the per-query class logits (dropping the trailing null class),
    sigmoid the per-query masks, and aggregate
    ``scores[c, h, w] = sum_q p_q(c) * sigma(m_q(h, w))`` — the ``sem_seg``
    tensor the reference thresholds and argmaxes (compute_mask.py:726-761).

    Args:
      class_queries_logits: [Q, C+1] (last class = "no object").
      masks_queries_logits: [Q, H, W].

    Returns [C, H, W] float32 scores.
    """
    cls = np.asarray(class_queries_logits, np.float64)
    msk = np.asarray(masks_queries_logits, np.float64)
    cls = cls - cls.max(axis=-1, keepdims=True)
    p = np.exp(cls)
    p = p / p.sum(axis=-1, keepdims=True)          # [Q, C+1]
    p = p[:, :-1]                                  # drop null class
    m = 1.0 / (1.0 + np.exp(-msk))                 # [Q, H, W]
    return np.einsum("qc,qhw->chw", p, m).astype(np.float32)


def semantic_map_from_scores(
    scores: np.ndarray, prob_thres: float = SEM_SEG_PROB_THRES
) -> np.ndarray:
    """argmax seg map with low-confidence pixels marked -1.

    Matches the reference post-processing: ``sem_seg.argmax(0)`` then
    pixels whose max score is below ``prob_thres`` are set to -1 so they
    can never match a movable class (compute_mask.py:729-761,
    FLAG_CONSIDER_PROB path).
    """
    seg = np.argmax(scores, axis=0).astype(np.int64)
    seg[np.max(scores, axis=0) < prob_thres] = -1
    return seg


def semantic_dynamic_union(
    sem_seg_ade20k: np.ndarray, sem_seg_coco: np.ndarray
) -> np.ndarray:
    """Union of movable classes over both vocabularies.

    The reference's mask_type == "semantic" branch (compute_mask.py:
    367-381): IDs are 1-indexed in the lists, seg maps are 0-indexed.
    """
    mask_ade = np.isin(sem_seg_ade20k, [i - 1 for i in DYNAMIC_IDS_ADE20K])
    mask_coco = np.isin(sem_seg_coco, [i - 1 for i in DYNAMIC_IDS_COCO])
    return mask_ade | mask_coco


# --------------------------------------------------------------------------
# transformers wiring (weights required; lazy imports keep this module
# importable in minimal environments)
# --------------------------------------------------------------------------

ONEFORMER_ADE20K = "shi-labs/oneformer_ade20k_dinat_large"
ONEFORMER_COCO = "shi-labs/oneformer_coco_dinat_large"
SAM_VIT_H = "facebook/sam-vit-huge"


def load_oneformer(model_name: str, local_only: bool = True):
    from transformers import (
        OneFormerForUniversalSegmentation,
        OneFormerProcessor,
    )

    proc = OneFormerProcessor.from_pretrained(
        model_name, local_files_only=local_only
    )
    model = OneFormerForUniversalSegmentation.from_pretrained(
        model_name, local_files_only=local_only
    ).eval()
    return model, proc


def oneformer_semantic_seg(
    image_rgb: np.ndarray,
    model,
    processor,
    prob_thres: float = SEM_SEG_PROB_THRES,
) -> np.ndarray:
    """[H, W] int64 semantic map (-1 = low confidence) for one RGB image."""
    import torch
    import torch.nn.functional as F

    with torch.no_grad():
        inputs = processor(
            images=image_rgb, task_inputs=["semantic"], return_tensors="pt"
        )
        out = model(**inputs)
        scores = semantic_scores_from_queries(
            out.class_queries_logits[0].numpy(),
            out.masks_queries_logits[0].numpy(),
        )
        h, w = image_rgb.shape[:2]
        scores_t = torch.from_numpy(scores)[None]
        scores_up = F.interpolate(
            scores_t, size=(h, w), mode="bilinear", align_corners=False
        )[0].numpy()
    return semantic_map_from_scores(scores_up, prob_thres=prob_thres)


def sam_everything_segments(
    image_rgb: np.ndarray,
    generator,
    min_area: int = 0,
) -> np.ndarray:
    """[N, H, W] bool segment stack from a transformers mask-generation
    pipeline (the reference's SamAutomaticMaskGenerator everything mode,
    compute_mask.py:619-640), area-sorted descending."""
    import PIL.Image

    out = generator(PIL.Image.fromarray(image_rgb))
    masks = [np.asarray(m, bool) for m in out["masks"]]
    masks = [m for m in masks if m.sum() >= min_area]
    masks.sort(key=lambda m: int(m.sum()), reverse=True)
    if not masks:
        return np.zeros((0,) + image_rgb.shape[:2], bool)
    return np.stack(masks)


def main(argv: Optional[Sequence[str]] = None):
    """Produce the raw semantic masks + SAM stacks consumed by
    ``combine_masks.py``'s CLI: for each image writes ``<name>.npy``
    (movable-class union), ``<name>_sam.npy`` ([N, H, W] segments) and the
    two seg maps for inspection."""
    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--ade20k-model", default=ONEFORMER_ADE20K)
    ap.add_argument("--coco-model", default=ONEFORMER_COCO)
    ap.add_argument("--sam-model", default=SAM_VIT_H)
    ap.add_argument("--no-sam", action="store_true")
    ap.add_argument("--prob-thres", type=float, default=SEM_SEG_PROB_THRES)
    ap.add_argument(
        "--allow-download", action="store_true",
        help="permit fetching checkpoints from the HF hub",
    )
    args = ap.parse_args(argv)

    import PIL.Image

    image_dir = pathlib.Path(args.image_dir)
    out_dir = pathlib.Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    images = sorted(
        p for p in image_dir.iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    if not images:
        raise SystemExit(f"no images under {image_dir}")

    local_only = not args.allow_download
    try:
        ade_model, ade_proc = load_oneformer(args.ade20k_model, local_only)
        coco_model, coco_proc = load_oneformer(args.coco_model, local_only)
    except Exception as e:  # noqa: BLE001 - checkpoint resolution
        raise SystemExit(
            "OneFormer checkpoints unavailable "
            f"({e}); provision the HF cache or pass --allow-download. "
            "Masks can instead be supplied precomputed (SURVEY §2.3.6)."
        )
    generator = None
    if not args.no_sam:
        from transformers import pipeline

        generator = pipeline(
            "mask-generation", model=args.sam_model, device=-1
        )

    for img_path in images:
        rgb = np.asarray(PIL.Image.open(img_path).convert("RGB"))
        seg_ade = oneformer_semantic_seg(
            rgb, ade_model, ade_proc, args.prob_thres
        )
        seg_coco = oneformer_semantic_seg(
            rgb, coco_model, coco_proc, args.prob_thres
        )
        union = semantic_dynamic_union(seg_ade, seg_coco)
        stem = img_path.stem
        np.save(out_dir / f"{stem}_semseg_ade20k.npy", seg_ade)
        np.save(out_dir / f"{stem}_semseg_coco.npy", seg_coco)
        np.save(out_dir / f"{stem}.npy", union)
        if generator is not None:
            np.save(
                out_dir / f"{stem}_sam.npy",
                sam_everything_segments(rgb, generator),
            )
        print(f"{stem}: dynamic {union.mean():.3%}")


if __name__ == "__main__":
    main()

"""FlowFormer-protocol tiled flow inference (model-agnostic).

Port of the reference's FlowFormer driver math
(``/root/reference/pgdvs/preprocess/compute_flow.py:61-212``): the released
FlowFormer weights are trained at a fixed 432x960 patch size, so large
frames are processed as overlapping patches blended with a centered
Gaussian weight map; small frames are adaptively resized up to the train
size (flow rescaled back).

The flow MODEL is pluggable — any ``model_fn(img1, img2) -> flow`` over
``[H, W, 3]`` float images (the native flax RAFT, a ported FlowFormer, or
any future model) runs under this protocol; the reference's FlowFormer
network itself is third-party (cloned at preprocess time, not vendored)
exactly like its OneFormer/SAM stages. TPU note: fixed patch sizes mean ONE
compiled shape regardless of video resolution — no per-resolution
recompiles.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence, Tuple

import numpy as np

FLOWFORMER_TRAIN_SIZE = (432, 960)


def compute_grid_indices(
    image_shape: Tuple[int, int],
    patch_size: Tuple[int, int] = FLOWFORMER_TRAIN_SIZE,
    min_overlap: int = 20,
) -> list:
    """Top-left corners of overlapping patches covering the image
    (reference compute_grid_indices; final patch flush with the border)."""
    if min_overlap >= patch_size[0] or min_overlap >= patch_size[1]:
        raise ValueError(
            f"Overlap should be less than size of patch (got {min_overlap}"
            f" for patch size {patch_size})."
        )
    if image_shape[0] == patch_size[0]:
        hs = list(range(0, image_shape[0], patch_size[0]))
    else:
        hs = list(range(0, image_shape[0], patch_size[0] - min_overlap))
    if image_shape[1] == patch_size[1]:
        ws = list(range(0, image_shape[1], patch_size[1]))
    else:
        ws = list(range(0, image_shape[1], patch_size[1] - min_overlap))
    hs[-1] = image_shape[0] - patch_size[0]
    ws[-1] = image_shape[1] - patch_size[1]
    return [(h, w) for h in hs for w in ws]


def compute_adaptive_image_size(image_size: Tuple[int, int]):
    """(w, h) resize target + scale for frames smaller than the train size
    (reference compute_adaptive_image_size — note the (w, h) return)."""
    target = FLOWFORMER_TRAIN_SIZE
    scale = max(target[0] / image_size[0], target[1] / image_size[1])
    return (int(image_size[1] * scale), int(image_size[0] * scale)), scale


def gaussian_patch_weight(
    patch_size: Tuple[int, int] = FLOWFORMER_TRAIN_SIZE, sigma: float = 1.0
) -> np.ndarray:
    """Centered Gaussian blending weight over one patch (compute_weight)."""
    h, w = np.meshgrid(
        np.arange(patch_size[0]), np.arange(patch_size[1]), indexing="ij"
    )
    h = h / float(patch_size[0]) - 0.5
    w = w / float(patch_size[1]) - 0.5
    r = np.sqrt(h**2 + w**2) / sigma
    denorm = 1.0 / (sigma * math.sqrt(2 * math.pi))
    return (denorm * np.exp(-0.5 * r**2)).astype(np.float32)


def tiled_flow(
    model_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
    img1: np.ndarray,
    img2: np.ndarray,
    patch_size: Tuple[int, int] = FLOWFORMER_TRAIN_SIZE,
    sigma: float = 1.0,
    min_overlap: int = 20,
) -> np.ndarray:
    """Weighted-overlap tiled inference (compute_flow_flowformer tile path).

    img*: [H, W, 3] with H, W >= patch_size. Returns [H, W, 2] flow.
    """
    h_img, w_img = img1.shape[:2]
    assert h_img >= patch_size[0] and w_img >= patch_size[1], (
        f"image {img1.shape} smaller than patch {patch_size}; resize with "
        "compute_adaptive_image_size and run un-tiled instead"
    )
    hws = compute_grid_indices((h_img, w_img), patch_size, min_overlap)
    w_patch = gaussian_patch_weight(patch_size, sigma)[..., None]

    flows = np.zeros((h_img, w_img, 2), np.float32)
    count = np.zeros((h_img, w_img, 1), np.float32)
    for (h, w) in hws:
        sl = np.s_[h : h + patch_size[0], w : w + patch_size[1]]
        f = np.asarray(model_fn(img1[sl], img2[sl]), np.float32)
        flows[sl] += f * w_patch
        count[sl] += w_patch
    return flows / count


def adaptive_flow(
    model_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
    img1: np.ndarray,
    img2: np.ndarray,
    patch_size: Tuple[int, int] = FLOWFORMER_TRAIN_SIZE,
) -> np.ndarray:
    """Un-tiled path: resize up to the train size, predict, scale flow back
    (reference prepare_image_flowformer + visualize no-tile branch)."""
    import jax
    import jax.numpy as jnp

    h_img, w_img = img1.shape[:2]
    (dw, dh), scale = compute_adaptive_image_size((h_img, w_img))

    def rs(im):
        return np.asarray(
            jax.image.resize(jnp.asarray(im, jnp.float32), (dh, dw, 3),
                             "cubic")
        )

    f = np.asarray(model_fn(rs(img1), rs(img2)), np.float32)
    f = np.asarray(
        jax.image.resize(jnp.asarray(f), (h_img, w_img, 2), "bilinear")
    )
    return f / scale

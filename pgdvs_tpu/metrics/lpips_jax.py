"""LPIPS (AlexNet, v0.1) in JAX, with torch weight ingestion.

Replicates the NSFF perceptual metric the reference uses for NVIDIA scenes
(``/root/reference/pgdvs/utils/nsff_lpips/``: AlexNet conv1-5 relu features,
per-channel unit normalization, squared difference, learned 1x1 linear
heads, masked spatial average with a nearest-resized mask) and the DyCheck
variant (spatial map + masked mean).

The learned linear heads ARE bundled (``weights/lpips_lin_alex_v0.1.pth`` —
the same 6 KB v0.1 heads the reference ships in-repo at
``nsff_lpips/weights/v0.1/alex.pth``). The AlexNet backbone is the standard
torchvision ``alexnet`` checkpoint; ``load_torch_weights`` finds it via (in
order) an explicit path, ``$PGDVS_CKPT_DIR/alexnet.pth``, the torch hub
cache (``~/.cache/torch/hub/checkpoints/alexnet-*.pth``), or an installed
torchvision — the same provenance the reference relies on (its nsff_lpips
instantiates pretrained torchvision nets at runtime). Without the backbone
the evaluator reports PSNR/SSIM only — LPIPS is additive, never
load-bearing for rendering.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

# ImageNet scaling constants used by LPIPS's ScalingLayer
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature config: (out_ch, kernel, stride, pad) per conv, with
# maxpool(3, 2) after convs 1, 2 and 5
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1, 4}


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


def alexnet_features(params, x):
    """x: [N, H, W, 3] in [-1, 1] -> list of 5 relu feature maps."""
    x = (x - _SHIFT) / _SCALE
    feats = []
    for i, (_c, _k, s, p) in enumerate(_ALEX_CONVS):
        x = _conv(x, params[f"conv{i}_w"], params[f"conv{i}_b"], s, p)
        x = jax.nn.relu(x)
        feats.append(x)
        if i in _POOL_AFTER and i != 4:
            x = _maxpool(x)
    return feats


def _nearest_resize_torch(m, h, w):
    """torch F.interpolate(mode='nearest') semantics: floor(i * in/out)
    source indexing (jax.image.resize 'nearest' rounds instead — off by one
    source row/col on downsampling, which shifts masked LPIPS ~1%)."""
    in_h, in_w = m.shape[1], m.shape[2]
    ys = jnp.floor(jnp.arange(h) * (in_h / h)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(w) * (in_w / w)).astype(jnp.int32)
    return m[:, ys][:, :, xs]


def lpips_distance(params, img0, img1, mask=None, spatial: bool = False):
    """LPIPS distance between two [H, W, 3] images in [0, 1].

    mask: optional [H, W, 1]; masked spatial average per layer (NSFF
    semantics: mask nearest-resized to each feature resolution).
    """
    x0 = (2.0 * img0 - 1.0)[None]
    x1 = (2.0 * img1 - 1.0)[None]
    f0 = alexnet_features(params, x0)
    f1 = alexnet_features(params, x1)
    total = 0.0
    for k in range(5):
        a = f0[k] / (jnp.linalg.norm(f0[k], axis=-1, keepdims=True) + 1e-10)
        b = f1[k] / (jnp.linalg.norm(f1[k], axis=-1, keepdims=True) + 1e-10)
        diff = (a - b) ** 2
        lin = params[f"lin{k}"]  # [C]
        dmap = jnp.sum(diff * lin, axis=-1, keepdims=True)  # [1, h, w, 1]
        if spatial:
            h, w = img0.shape[:2]
            total = total + jax.image.resize(dmap, (1, h, w, 1), "bilinear")
        elif mask is not None:
            h, w = dmap.shape[1:3]
            m = _nearest_resize_torch(mask[None], h, w)
            total = total + jnp.sum(dmap * m) / (jnp.sum(m) + 1e-8)
        else:
            total = total + jnp.mean(dmap)
    return total[0] if spatial else total


def load_torch_weights(
    alexnet_path: Optional[str] = None, lin_path: Optional[str] = None
):
    """Build the LPIPS param dict from torch checkpoints.

    alexnet_path: torchvision ``alexnet`` state dict (features.{0,3,6,8,10});
    lin_path: LPIPS linear heads (``lin{k}.model.1.weight`` [1, C, 1, 1]).
    Returns None when files are unavailable.
    """
    ckpt_dir = os.environ.get("PGDVS_CKPT_DIR", "")
    if lin_path is None:
        for cand in (
            os.path.join(ckpt_dir, "lpips_alex_v0.1.pth"),
            os.path.join(os.path.dirname(__file__), "weights",
                         "lpips_lin_alex_v0.1.pth"),  # bundled default
        ):
            if os.path.isfile(cand):
                lin_path = cand
                break
    if alexnet_path is None:
        import glob

        cands = [os.path.join(ckpt_dir, "alexnet.pth")] + sorted(
            glob.glob(
                os.path.expanduser(
                    "~/.cache/torch/hub/checkpoints/alexnet-*.pth"
                )
            )
        )
        for cand in cands:
            if os.path.isfile(cand):
                alexnet_path = cand
                break
    if lin_path is None or not os.path.isfile(lin_path):
        return None
    import torch

    if alexnet_path is None or not os.path.isfile(alexnet_path):
        try:  # last resort: an installed torchvision provides the backbone
            from torchvision.models import alexnet as _tv_alexnet

            sd = _tv_alexnet(weights="DEFAULT").state_dict()
        except Exception:  # noqa: BLE001
            return None
    else:
        sd = torch.load(alexnet_path, map_location="cpu", weights_only=True)
    lin_sd = torch.load(lin_path, map_location="cpu", weights_only=True)
    params = {}
    torch_idx = [0, 3, 6, 8, 10]
    for i, ti in enumerate(torch_idx):
        w = sd[f"features.{ti}.weight"].numpy()  # [out, in, kh, kw]
        params[f"conv{i}_w"] = jnp.asarray(w.transpose(2, 3, 1, 0))
        params[f"conv{i}_b"] = jnp.asarray(sd[f"features.{ti}.bias"].numpy())
    for k in range(5):
        for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if key in lin_sd:
                params[f"lin{k}"] = jnp.asarray(
                    lin_sd[key].numpy().reshape(-1)
                )
                break
        else:
            return None
    return params

"""Epipolar projection + feature sampling for GNT (pure jnp).

Functional equivalent of the reference Projector
(``/root/reference/pgdvs/models/gnt/projector.py:117-308``): world sample
points are projected into every source camera; source rgb, deep features and
(optionally) dynamic masks are bilinearly sampled at the projections; the
validity mask combines in-front, in-bounds and not-dynamic.

Conventions locked to the reference:
  * rgb is sampled at full resolution with grid_sample align_corners=True
    semantics — i.e. plain bilinear at pixel coordinates with zero padding;
  * feature maps live at 1/4 resolution but are addressed with the *same
    normalized* coordinates, i.e. featmap pixels = uv * (wf-1)/(w-1);
  * a sampled dynamic-mask value > 1e-3 marks the tap invalid
    (``projector.py:265-271``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pgdvs_tpu.core import cameras
from pgdvs_tpu.core.interpolate import bilinear_sample


def epipolar_sample(
    pts,
    tgt_cam,
    src_cams,
    src_rgbs,
    src_feats,
    src_invalid_masks=None,
    sample_dtype=None,
):
    """Sample source views along epipolar projections of world points.

    Args:
      pts: [R, S, 3] world sample points.
      tgt_cam: [34] target flat camera.
      src_cams: [V, 34] source flat cameras.
      src_rgbs: [V, H, W, 3].
      src_feats: [V, Hf, Wf, F] deep features (any resolution).
      src_invalid_masks: optional [V, H, W, 1], 1 = invalid (dynamic).

    Returns dict (all view-major -> transposed to [R, S, V, *]):
      rgb_feat [R, S, V, 3+F], ray_diff [R, S, V, 4],
      mask [R, S, V, 1] (validity incl. dynamic),
      mask_inbound [R, S, V, 1], mask_invalid [R, S, V, 1].
    """
    h, w = src_rgbs.shape[1], src_rgbs.shape[2]
    hf, wf = src_feats.shape[1], src_feats.shape[2]
    tgt_c2w = cameras.flat_cam_c2w(tgt_cam)
    if sample_dtype is not None:
        # sample in the network's activation dtype (bf16 halves the gather
        # traffic of the hot op; pass None for f32 parity runs)
        src_rgbs = src_rgbs.astype(sample_dtype)
        src_feats = src_feats.astype(sample_dtype)

    def per_view(cam, rgb, feat, inv_mask):
        uv, _z, in_front = cameras.project_points(pts, cam)  # [R, S, 2]
        inbound = cameras.pixel_inbound(uv, float(h), float(w))
        x, y = uv[..., 0], uv[..., 1]
        rgb_s = bilinear_sample(rgb, x, y)  # [R, S, 3]
        scale_x = (wf - 1.0) / (w - 1.0)
        scale_y = (hf - 1.0) / (h - 1.0)
        feat_s = bilinear_sample(feat, x * scale_x, y * scale_y)  # [R, S, F]
        diff = cameras.ray_diff_features(pts, tgt_c2w, cameras.flat_cam_c2w(cam))
        mask_inb = (inbound & in_front).astype(rgb_s.dtype)[..., None]
        if inv_mask is not None:
            inv_s = (bilinear_sample(inv_mask, x, y) > 1e-3).astype(rgb_s.dtype)
            mask = mask_inb * (1.0 - inv_s)
        else:
            inv_s = jnp.zeros_like(mask_inb)
            mask = mask_inb
        return jnp.concatenate([rgb_s, feat_s], axis=-1), diff, mask, mask_inb, inv_s

    in_axes = (0, 0, 0, 0 if src_invalid_masks is not None else None)
    rgb_feat, ray_diff, mask, mask_inb, mask_inv = jax.vmap(per_view, in_axes=in_axes)(
        src_cams, src_rgbs, src_feats, src_invalid_masks
    )

    def to_rsv(x):  # [V, R, S, C] -> [R, S, V, C]
        return jnp.moveaxis(x, 0, 2)

    return {
        "rgb_feat": to_rsv(rgb_feat),
        "ray_diff": to_rsv(ray_diff),
        "mask": to_rsv(mask),
        "mask_inbound": to_rsv(mask_inb),
        "mask_invalid": to_rsv(mask_inv),
    }

"""Forward-backward flow cycle consistency (occlusion detection).

Equivalent of the reference's ``compute_occlusion``
(``/root/reference/pgdvs/preprocess/common.py:314-325``): chain the forward
flow with a bilinear lookup of the backward flow; the round-trip coordinate
error marks occluded pixels. Produces the ``coord_diff`` arrays the datasets
threshold into occlusion masks.

Pure jnp; runs as part of on-device preprocessing or host-side via numpy
inputs.
"""

from __future__ import annotations

import jax.numpy as jnp

from pgdvs_tpu.core.interpolate import bilinear_sample


def flow_roundtrip(flow_fwd, flow_bwd):
    """coord_diff and its norm for a fwd/bwd flow pair.

    Args:
      flow_fwd: [H, W, 2] flow a->b; flow_bwd: [H, W, 2] flow b->a.

    Returns:
      coord_diff: [H, W, 2] start - roundtrip coordinates;
      err: [H, W] L2 norm of coord_diff.

    Note: the reference's ``bilinear_sampler`` (RAFT's, common.py:211-225)
    normalizes pixel coords by (W-1, H-1) and samples with torch
    grid_sample ``align_corners=True`` — i.e. it reads the backward flow
    at exactly the advected pixel coordinate ``u`` with zero padding
    (NOT at ``u - 0.5``; that is the align_corners=False convention the
    dynamic renderer uses). A/B: tests/test_flow_consistency_ab.py.
    """
    h, w = flow_fwd.shape[:2]
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=flow_fwd.dtype),
        jnp.arange(w, dtype=flow_fwd.dtype),
        indexing="ij",
    )
    coords0 = jnp.stack([gx, gy], axis=-1)
    coords1 = coords0 + flow_fwd
    bwd_at_1 = bilinear_sample(flow_bwd, coords1[..., 0], coords1[..., 1])
    coords2 = coords1 + bwd_at_1
    coord_diff = coords0 - coords2
    err = jnp.linalg.norm(coord_diff, axis=-1)
    return coord_diff, err


def occlusion_mask(flow_fwd, flow_bwd, thresh: float = 1.0):
    """Boolean [H, W] mask: True where the flow round trip exceeds thresh."""
    _, err = flow_roundtrip(flow_fwd, flow_bwd)
    return err > thresh

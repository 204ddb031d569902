"""Port CoTracker torch checkpoints into the flax CoTrackerModel.

Checkpoint: ``cotracker/cotracker_stride_4_wind_8.pth`` (reference
``download_ckpts.sh``, loaded by ``build_cotracker.py:54-72``; key layout
from ``models/core/cotracker/cotracker.py:73-117`` + ``blocks.py``).

Mapping rules:
  * Linear weight [out, in]       -> Dense kernel [in, out]
  * Conv2d weight [out, in, kh, kw] -> Conv kernel [kh, kw, in, out]
  * GroupNorm weight/bias         -> scale/bias
  * InstanceNorm2d / affine-less LayerNorms carry no parameters.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _lin(sd, name):
    out = {"kernel": np.asarray(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _conv(sd, name):
    out = {"kernel": np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _attn_block(sd, prefix):
    return {
        "attn": {
            "qkv": _lin(sd, f"{prefix}.attn.qkv"),
            "proj": _lin(sd, f"{prefix}.attn.proj"),
        },
        "mlp_fc1": _lin(sd, f"{prefix}.mlp.fc1"),
        "mlp_fc2": _lin(sd, f"{prefix}.mlp.fc2"),
    }


def port_cotracker(sd, time_depth: int = 6, space_depth: int = 6) -> dict:
    """torch CoTracker state dict -> flax CoTrackerModel params['params']."""
    fnet = {
        "conv1": {"conv": _conv(sd, "fnet.conv1")},
        "conv2": {"conv": _conv(sd, "fnet.conv2")},
        "conv3": {"conv": _conv(sd, "fnet.conv3")},
    }
    for li, n_blocks in (("1", 2), ("2", 2), ("3", 2), ("4", 2)):
        for bi in range(n_blocks):
            t = f"fnet.layer{li}.{bi}"
            blk = {
                "conv1": {"conv": _conv(sd, f"{t}.conv1")},
                "conv2": {"conv": _conv(sd, f"{t}.conv2")},
            }
            if f"{t}.downsample.0.weight" in sd:
                blk["downsample"] = {"conv": _conv(sd, f"{t}.downsample.0")}
            fnet[f"layer{li}_{bi}"] = blk

    uf = {
        "input_transform": _lin(sd, "updateformer.input_transform"),
        "flow_head": _lin(sd, "updateformer.flow_head"),
    }
    for i in range(time_depth):
        uf[f"time_{i}"] = _attn_block(sd, f"updateformer.time_blocks.{i}")
    for j in range(space_depth):
        uf[f"space_{j}"] = _attn_block(sd, f"updateformer.space_blocks.{j}")

    return {
        "fnet": fnet,
        "updateformer": uf,
        "delta_norm": {
            "scale": np.asarray(sd["norm.weight"]),
            "bias": np.asarray(sd["norm.bias"]),
        },
        "ffeat_updater": _lin(sd, "ffeat_updater.0"),
        "vis_predictor": _lin(sd, "vis_predictor.0"),
    }


def load_cotracker_checkpoint(path: Optional[str] = None):
    """Load + port the released CoTracker checkpoint.

    Returns flax params ({'params': ...}) or None when unavailable.
    """
    path = path or os.path.join(
        os.environ.get("PGDVS_CKPT_DIR", ""),
        "cotracker",
        "cotracker_stride_4_wind_8.pth",
    )
    if not os.path.isfile(path):
        return None
    import torch
    import jax
    import jax.numpy as jnp

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "model" in sd:
        sd = sd["model"]
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    params = port_cotracker(sd)
    return {"params": jax.tree_util.tree_map(jnp.asarray, params)}

"""Port princeton-vl RAFT checkpoints (raft-things.pth) into the flax RAFT.

Key layout: torch state dict with a ``module.`` DataParallel prefix;
feature encoder instance norms carry no parameters, context-encoder batch
norms map their running statistics into eval-mode parameters
(weight/bias/running_mean/running_var -> scale/bias/mean/var).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _conv(sd, name):
    out = {"kernel": np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _bn(sd, name):
    return {
        "scale": np.asarray(sd[f"{name}.weight"]),
        "bias": np.asarray(sd[f"{name}.bias"]),
        "mean": np.asarray(sd[f"{name}.running_mean"]),
        "var": np.asarray(sd[f"{name}.running_var"]),
    }


def _encoder(sd, prefix, batch_norm: bool):
    enc = {
        "conv1": {"conv": _conv(sd, f"{prefix}.conv1")},
        "conv2": {"conv": _conv(sd, f"{prefix}.conv2")},
    }
    if batch_norm:
        enc["norm1"] = _bn(sd, f"{prefix}.norm1")
    for li in (1, 2, 3):
        for bi in (0, 1):
            t = f"{prefix}.layer{li}.{bi}"
            blk = {
                "conv1": {"conv": _conv(sd, f"{t}.conv1")},
                "conv2": {"conv": _conv(sd, f"{t}.conv2")},
            }
            if batch_norm:
                blk["norm1"] = _bn(sd, f"{t}.norm1")
                blk["norm2"] = _bn(sd, f"{t}.norm2")
            if f"{t}.downsample.0.weight" in sd:
                blk["downsample"] = {"conv": _conv(sd, f"{t}.downsample.0")}
                if batch_norm:
                    blk["norm3"] = _bn(sd, f"{t}.downsample.1")
            enc[f"layer{li}_{bi}"] = blk
    return enc


def port_raft(sd) -> dict:
    """torch RAFT state dict (module.-prefixed) -> flax params['params']."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    ub = "update_block"
    return {
        "fnet": _encoder(sd, "fnet", batch_norm=False),
        "cnet": _encoder(sd, "cnet", batch_norm=True),
        "update_block": {
            "encoder": {
                name: {"conv": _conv(sd, f"{ub}.encoder.{name}")}
                for name in ("convc1", "convc2", "convf1", "convf2", "conv")
            },
            "gru": {
                name: {"conv": _conv(sd, f"{ub}.gru.{name}")}
                for name in ("convz1", "convr1", "convq1",
                             "convz2", "convr2", "convq2")
            },
            "flow_head_conv1": {"conv": _conv(sd, f"{ub}.flow_head.conv1")},
            "flow_head_conv2": {"conv": _conv(sd, f"{ub}.flow_head.conv2")},
            "mask_conv1": {"conv": _conv(sd, f"{ub}.mask.0")},
            "mask_conv2": {"conv": _conv(sd, f"{ub}.mask.2")},
        },
    }


def load_raft_checkpoint(path: Optional[str] = None):
    """Load + port raft-things.pth. Returns flax params or None."""
    path = path or os.path.join(
        os.environ.get("PGDVS_CKPT_DIR", ""), "raft", "models",
        "raft-things.pth",
    )
    if not os.path.isfile(path):
        return None
    import torch
    import jax
    import jax.numpy as jnp

    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    return {"params": jax.tree_util.tree_map(jnp.asarray, port_raft(sd))}

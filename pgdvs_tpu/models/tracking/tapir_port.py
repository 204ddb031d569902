"""Remap the released haiku TAPIR checkpoint onto the flax Tapir module.

The deepmind checkpoint is a flat ``{haiku_module_path: {param: array}}``
dict with paths like ``tapir/~/resnet/~/block_group_0/~/block_0/conv_0``.
This module normalizes those paths and rebuilds the nested flax params tree
used by ``pgdvs_tpu.models.tracking.tapir.Tapir``.

Transposes: haiku Conv2D kernels are already [kh, kw, in, out] (same as
flax); haiku Linear 'w' is [in, out] (same as flax Dense kernel); haiku
DepthwiseConv1D kernels [k, 1, C*mult] -> flax grouped-Conv [k, 1, C*mult].
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _norm_path(path: str) -> str:
    parts = [p for p in path.split("/") if p not in ("~", "tapir")]
    return "/".join(parts)


def _set(tree: dict, keys, value):
    cur = tree
    for k in keys[:-1]:
        cur = cur.setdefault(k, {})
    cur[keys[-1]] = value


def remap_haiku_params(ckpt: Dict[str, dict]) -> dict:
    params: dict = {}
    unmatched = []

    for raw_path, vals in ckpt.items():
        path = _norm_path(raw_path)
        dest = _map_path(path)
        if dest is None:
            unmatched.append(raw_path)
            continue
        for pname, arr in vals.items():
            arr = np.asarray(arr)
            if pname == "w":
                if dest[-1].startswith("mlp1_up"):
                    # haiku DepthwiseConv1D [k, C, mult] -> flax grouped conv
                    # [k, 1, C*mult] (both order output channels c*mult + m)
                    k = arr.shape[0]
                    arr = arr.reshape(k, 1, -1)
                _set(params, dest + ("kernel",), arr)
            elif pname == "b":
                _set(params, dest + ("bias",), arr)
            elif pname == "scale":
                _set(params, dest + ("scale",), arr.reshape(-1))
            elif pname == "offset":
                _set(params, dest + ("bias",), arr.reshape(-1))
            else:
                unmatched.append(f"{raw_path}:{pname}")

    if unmatched:
        raise ValueError(
            "unmatched TAPIR checkpoint entries (format drift?):\n"
            + "\n".join(sorted(unmatched))
        )
    return params


def _map_path(path: str):
    """haiku path -> nested flax module path tuple, or None if unknown."""
    parts = path.split("/")

    # resnet
    if parts[0] == "resnet":
        if parts[-1] == "initial_conv":
            return ("resnet", "initial_conv")
        # block_group_G/block_B/<layer>
        try:
            g = next(p for p in parts if p.startswith("block_group_"))
            b = next(p for p in parts if p.startswith("block_") and "group" not in p)
        except StopIteration:
            return None
        gi = int(g.split("_")[-1])
        bi = int(b.split("_")[-1])
        layer = parts[-1]
        name_map = {
            "conv_0": "conv_0",
            "conv_1": "conv_1",
            "shortcut_conv": "shortcut_conv",
            "instancenorm_0": ("instancenorm_0", "GroupNorm_0"),
            "instancenorm_1": ("instancenorm_1", "GroupNorm_0"),
        }
        if layer not in name_map:
            return None
        tail = name_map[layer]
        tail = tail if isinstance(tail, tuple) else (tail,)
        return ("resnet", f"group_{gi}_block_{bi}") + tail

    # cost-volume heads
    head_names = {
        "cost_volume_regression_1",
        "cost_volume_regression_2",
        "cost_volume_occlusion_1",
        "cost_volume_occlusion_2",
        "occlusion_out",
    }
    if parts[-1] in head_names:
        return (parts[-1],)

    # pips mixer
    if parts[0] == "pips_mlp_mixer":
        if len(parts) == 2 and parts[1] in ("linear", "linear_1", "layer_norm"):
            return ("pips_mlp_mixer", parts[1])
        # block / block_N internals
        blk = parts[1]
        if blk == "block":
            blk = "block_0"
        elif blk.startswith("block_"):
            blk = f"block_{int(blk.split('_')[-1])}"
        else:
            return None
        layer = parts[-1]
        if layer in (
            "layer_norm",
            "layer_norm_1",
            "mlp1_up",
            "mlp1_up_1",
            "mlp2_up",
            "mlp2_down",
        ):
            return ("pips_mlp_mixer", blk, layer)
    return None

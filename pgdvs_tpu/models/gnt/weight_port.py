"""Port pretrained GNT torch checkpoints into the flax modules.

The released checkpoint (``gnt/model_720000.pth`` — reference
``download_ckpts.sh:21-23``) stores ``{net_coarse, feature_net[, net_fine]}``
torch state dicts (``/root/reference/pgdvs/models/gnt/model.py:64-101``).
This module remaps them onto the pytrees produced by
``pgdvs_tpu.renderers.static_gnt.init_gnt_params``:

  * Linear weight [out, in]      -> Dense kernel  [in, out]   (transpose)
  * Conv2d weight [out, in, kh, kw] -> Conv kernel [kh, kw, in, out]
  * InstanceNorm / LayerNorm weight/bias -> scale/bias

Checkpoint location: pass a path or set ``PGDVS_CKPT_DIR`` (expects
``gnt/model_720000.pth``). Returns None when unavailable so callers can fall
back to random initialization (rendering still runs; quality parity needs
the real weights).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _lin(sd, name):
    return np.asarray(sd[f"{name}.weight"]).T, (
        np.asarray(sd[f"{name}.bias"]) if f"{name}.bias" in sd else None
    )


def _conv(sd, name):
    return np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)


def _norm(sd, name):
    return {
        "scale": np.asarray(sd[f"{name}.weight"]),
        "bias": np.asarray(sd[f"{name}.bias"]),
    }


def _dense(sd, name, bias=True):
    k, b = _lin(sd, name)
    out = {"kernel": k}
    if bias and b is not None:
        out["bias"] = b
    return out


def port_feature_net(sd) -> dict:
    """torch ResUNet state dict -> flax ResUNet params['params']."""
    p = {}
    p["conv1"] = {"Conv_0": {"kernel": _conv(sd, "conv1")}}
    p["bn1"] = {"GroupNorm_0": _norm(sd, "bn1")}

    blocks = {"layer1": 3, "layer2": 4, "layer3": 6}
    for layer, n in blocks.items():
        for i in range(n):
            t = f"{layer}.{i}"
            blk = {
                "conv1": {"Conv_0": {"kernel": _conv(sd, f"{t}.conv1")}},
                "bn1": {"GroupNorm_0": _norm(sd, f"{t}.bn1")},
                "conv2": {"Conv_0": {"kernel": _conv(sd, f"{t}.conv2")}},
                "bn2": {"GroupNorm_0": _norm(sd, f"{t}.bn2")},
            }
            if f"{t}.downsample.0.weight" in sd:
                blk["down_conv"] = {
                    "Conv_0": {"kernel": _conv(sd, f"{t}.downsample.0")}
                }
                blk["down_bn"] = {"GroupNorm_0": _norm(sd, f"{t}.downsample.1")}
            p[f"{layer}_{i}"] = blk

    for name, t_conv, t_bn in (
        ("upconv3", "upconv3.conv.conv", "upconv3.conv.bn"),
        ("iconv3", "iconv3.conv", "iconv3.bn"),
        ("upconv2", "upconv2.conv.conv", "upconv2.conv.bn"),
        ("iconv2", "iconv2.conv", "iconv2.bn"),
    ):
        p[name] = {
            "conv": {
                "Conv_0": {
                    "kernel": _conv(sd, t_conv),
                    "bias": np.asarray(sd[f"{t_conv}.bias"]),
                }
            },
            "bn": {"GroupNorm_0": _norm(sd, t_bn)},
        }
    p["out_conv"] = {
        "kernel": _conv(sd, "out_conv"),
        "bias": np.asarray(sd["out_conv.bias"]),
    }
    return p


def _view_trans(sd, prefix):
    return {
        "attn_norm": _norm(sd, f"{prefix}.attn_norm"),
        "ff_norm": _norm(sd, f"{prefix}.ff_norm"),
        "attn": {
            "q_fc": _dense(sd, f"{prefix}.attn.q_fc", bias=False),
            "k_fc": _dense(sd, f"{prefix}.attn.k_fc", bias=False),
            "v_fc": _dense(sd, f"{prefix}.attn.v_fc", bias=False),
            "pos_fc_0": _dense(sd, f"{prefix}.attn.pos_fc.0"),
            "pos_fc_1": _dense(sd, f"{prefix}.attn.pos_fc.2"),
            "attn_fc_0": _dense(sd, f"{prefix}.attn.attn_fc.0"),
            "attn_fc_1": _dense(sd, f"{prefix}.attn.attn_fc.2"),
            "out_fc": _dense(sd, f"{prefix}.attn.out_fc"),
        },
        "ff": {
            "fc1": _dense(sd, f"{prefix}.ff.fc1"),
            "fc2": _dense(sd, f"{prefix}.ff.fc2"),
        },
    }


def _ray_trans(sd, prefix):
    return {
        "attn_norm": _norm(sd, f"{prefix}.attn_norm"),
        "ff_norm": _norm(sd, f"{prefix}.ff_norm"),
        "attn": {
            "q_fc": _dense(sd, f"{prefix}.attn.q_fc", bias=False),
            "k_fc": _dense(sd, f"{prefix}.attn.k_fc", bias=False),
            "v_fc": _dense(sd, f"{prefix}.attn.v_fc", bias=False),
            "out_fc": _dense(sd, f"{prefix}.attn.out_fc"),
        },
        "ff": {
            "fc1": _dense(sd, f"{prefix}.ff.fc1"),
            "fc2": _dense(sd, f"{prefix}.ff.fc2"),
        },
    }


def _stack_trees(trees):
    """Stack a list of identically-structured dicts along a new leading dim
    (the nn.scan parameter layout: params indexed [pair, ...])."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *trees)


def port_gnt(sd, depth: int = 8) -> dict:
    """torch GNT state dict -> flax GNT params['params'].

    Blocks are stored scanned-in-pairs (see GNTBlockPair): torch block
    2p -> slot 'a' of pair p, block 2p+1 -> slot 'b'.
    """
    p = {}
    p["rgbfeat_fc_0"] = _dense(sd, "rgbfeat_fc.0")
    p["rgbfeat_fc_1"] = _dense(sd, "rgbfeat_fc.2")

    pairs = []
    for pi in range(depth // 2):
        a, b = 2 * pi, 2 * pi + 1
        pairs.append(
            {
                "view_trans_a": _view_trans(sd, f"view_crosstrans.{a}"),
                "ray_trans_a": _ray_trans(sd, f"view_selftrans.{a}"),
                "view_trans_b": _view_trans(sd, f"view_crosstrans.{b}"),
                "ray_trans_b": _ray_trans(sd, f"view_selftrans.{b}"),
                "q_fc_0": _dense(sd, f"q_fcs.{a}.0"),
                "q_fc_1": _dense(sd, f"q_fcs.{a}.2"),
            }
        )
    p["block_pairs"] = _stack_trees(pairs)
    p["norm"] = _norm(sd, "norm")
    p["rgb_fc"] = _dense(sd, "rgb_fc")
    return p


def load_gnt_checkpoint(path: Optional[str] = None, depth: int = 8):
    """Load + port the full GNT checkpoint.

    Returns {"feature_net": {...}, "gnt": {...}} flax-style param pytrees
    (wrapped in {"params": ...}), or None when no checkpoint is found.
    """
    path = path or os.path.join(
        os.environ.get("PGDVS_CKPT_DIR", ""), "gnt", "model_720000.pth"
    )
    if not os.path.isfile(path):
        return None
    import torch
    import jax.numpy as jnp
    import jax

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    to_np = lambda sd: {k: v.detach().numpy() for k, v in sd.items()}
    fparams = port_feature_net(to_np(ckpt["feature_net"]))
    gparams = port_gnt(to_np(ckpt["net_coarse"]), depth=depth)
    as_jnp = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)
    return {
        "feature_net": {"params": as_jnp(fparams)},
        "gnt": {"params": as_jnp(gparams)},
    }

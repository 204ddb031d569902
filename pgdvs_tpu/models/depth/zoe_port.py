"""ZoeDepth / MiDaS DPT-BEiT checkpoint -> flax param mapping.

Maps the published ``ZoeD_M12_*.pt`` layout (``compute_zoedepth.py:146-166``
contract: Zoe wraps MiDaS as ``core.core.*`` — timm BEiT under
``pretrained.model.*``, DPT reassemble under ``pretrained.act_postprocess*``,
fusion/head under ``scratch.*``) onto ``dpt_beit.DPTBeitBackbone``.

Key-coverage is strict: every checkpoint key must be either consumed or in
the known-droppable set (buffers recomputed at trace time, unused
classifier heads); anything else raises. This keeps the port honest against
layout drift even though the weights themselves cannot be provisioned in
this environment (tests/test_dpt_beit.py builds a synthetic state dict with
the full published layout and checks bijective coverage + a forward pass).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

# buffers / unused modules that may appear in released checkpoints
_DROPPABLE = re.compile(
    r"(relative_position_index$)"
    r"|(^model\.norm\.)"         # timm final norm (hooks are pre-norm)
    r"|(^model\.fc_norm\.)"
    r"|(^model\.head\.)"
    r"|(attn\.k_bias$)"          # zero buffer in some timm versions
)


def _t_linear(w):
    return np.ascontiguousarray(w.T)


def _t_conv(w):  # [out, in, kh, kw] -> [kh, kw, in, out]
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def port_dpt_beit(sd: Dict[str, np.ndarray], depth: int = 24) -> Tuple[dict, list]:
    """MiDaS-core state dict -> DPTBeitBackbone param tree.

    Accepts keys with any of the prefixes ``core.core.``, ``core.`` or none
    (Zoe checkpoints vs bare MiDaS ones); ``pretrained.`` is then expected.
    Returns (params, dropped_keys). Raises KeyError on missing weights and
    ValueError on unrecognized ones.
    """
    # normalize prefixes
    norm = {}
    for k, v in sd.items():
        for pre in ("core.core.", "core.", ""):
            if k.startswith(pre + "pretrained.") or k.startswith(pre + "scratch."):
                norm[k[len(pre):]] = np.asarray(v)
                break
    sd = norm
    used = set()

    def take(key):
        if key not in sd:
            raise KeyError(f"checkpoint missing {key}")
        used.add(key)
        return sd[key]

    p: dict = {}
    pm = "pretrained.model."
    p["cls_token"] = np.asarray(take(pm + "cls_token")).reshape(1, -1)
    p["patch_embed"] = {
        "kernel": _t_conv(take(pm + "patch_embed.proj.weight")),
        "bias": take(pm + "patch_embed.proj.bias"),
    }
    for i in range(depth):
        b = f"{pm}blocks.{i}."
        p[f"block_{i}"] = {
            "norm1": {"scale": take(b + "norm1.weight"),
                      "bias": take(b + "norm1.bias")},
            "norm2": {"scale": take(b + "norm2.weight"),
                      "bias": take(b + "norm2.bias")},
            "gamma_1": take(b + "gamma_1"),
            "gamma_2": take(b + "gamma_2"),
            "attn": {
                "qkv_kernel": _t_linear(take(b + "attn.qkv.weight")),
                "q_bias": take(b + "attn.q_bias"),
                "v_bias": take(b + "attn.v_bias"),
                "relative_position_bias_table": take(
                    b + "attn.relative_position_bias_table"
                ),
                "proj": {
                    "kernel": _t_linear(take(b + "attn.proj.weight")),
                    "bias": take(b + "attn.proj.bias"),
                },
            },
            "mlp_fc1": {"kernel": _t_linear(take(b + "mlp.fc1.weight")),
                        "bias": take(b + "mlp.fc1.bias")},
            "mlp_fc2": {"kernel": _t_linear(take(b + "mlp.fc2.weight")),
                        "bias": take(b + "mlp.fc2.bias")},
        }

    for n in range(1, 5):
        ap = f"pretrained.act_postprocess{n}."
        p[f"readout_{n - 1}"] = {
            "kernel": _t_linear(take(ap + "0.project.0.weight")),
            "bias": take(ap + "0.project.0.bias"),
        }
        p[f"proj_{n - 1}"] = {
            "kernel": _t_conv(take(ap + "3.weight")),
            "bias": take(ap + "3.bias"),
        }
        if n in (1, 2):
            # ConvTranspose2d [in, out, k, k] -> _DeconvBlock kernel as-is
            p[f"deconv_{n - 1}"] = {
                "kernel": take(ap + "4.weight"),
                "bias": take(ap + "4.bias"),
            }
        elif n == 4:
            p["downconv_3"] = {
                "kernel": _t_conv(take(ap + "4.weight")),
                "bias": take(ap + "4.bias"),
            }

    for n in range(1, 5):
        p[f"layer{n}_rn"] = {
            "kernel": _t_conv(take(f"scratch.layer{n}_rn.weight"))
        }
        rf = f"scratch.refinenet{n}."
        block = {
            "resConfUnit2": {
                "conv1": {"kernel": _t_conv(take(rf + "resConfUnit2.conv1.weight")),
                          "bias": take(rf + "resConfUnit2.conv1.bias")},
                "conv2": {"kernel": _t_conv(take(rf + "resConfUnit2.conv2.weight")),
                          "bias": take(rf + "resConfUnit2.conv2.bias")},
            },
            "out_conv": {"kernel": _t_conv(take(rf + "out_conv.weight")),
                         "bias": take(rf + "out_conv.bias")},
        }
        if n != 4:
            # refinenet4 has a single input; its resConfUnit1 exists in
            # checkpoints but is dead in MiDaS's forward — mark consumed
            block["resConfUnit1"] = {
                "conv1": {"kernel": _t_conv(take(rf + "resConfUnit1.conv1.weight")),
                          "bias": take(rf + "resConfUnit1.conv1.bias")},
                "conv2": {"kernel": _t_conv(take(rf + "resConfUnit1.conv2.weight")),
                          "bias": take(rf + "resConfUnit1.conv2.bias")},
            }
        else:
            for dead in (
                rf + "resConfUnit1.conv1.weight", rf + "resConfUnit1.conv1.bias",
                rf + "resConfUnit1.conv2.weight", rf + "resConfUnit1.conv2.bias",
            ):
                if dead in sd:
                    used.add(dead)
        p[f"refinenet{n}"] = block

    for src, dst in (("0", "head_conv0"), ("2", "head_conv2"),
                     ("4", "head_conv4")):
        p[dst] = {
            "kernel": _t_conv(take(f"scratch.output_conv.{src}.weight")),
            "bias": take(f"scratch.output_conv.{src}.bias"),
        }

    # refinenet4 consumes only one input: its resConfUnit1 is unused by the
    # forward pass but present in checkpoints — keep it ported (harmless)
    leftovers = [k for k in sd if k not in used]
    dropped = [k for k in leftovers if _DROPPABLE.search(
        k[len("pretrained."):] if k.startswith("pretrained.") else k
    )]
    unknown = [k for k in leftovers if k not in dropped]
    if unknown:
        raise ValueError(f"unrecognized checkpoint keys: {unknown[:8]}")
    return p, dropped


def _take_pair(sd, used, base, kind="conv"):
    w, b = base + ".weight", base + ".bias"
    if w not in sd:
        raise KeyError(f"checkpoint missing {w}")
    used.add(w)
    used.add(b)
    tr = _t_conv if kind == "conv" else _t_linear
    return {"kernel": tr(sd[w]), "bias": sd[b]}


def _take_net(sd, used, base):
    """`_net = Sequential(Conv1x1, ReLU, Conv1x1)` -> {conv1, conv2}."""
    return {
        "conv1": _take_pair(sd, used, base + "._net.0"),
        "conv2": _take_pair(sd, used, base + "._net.2"),
    }


def port_zoe_head(sd: Dict[str, np.ndarray]) -> Tuple[dict, str]:
    """Original isl-org metric-head state dict -> flax head params.

    Detects the variant from the keys: ``patch_transformer.*`` present ->
    the two-domain NK head (``zoedepth_nk.py``), else the single head
    (``zoedepth.py``). Returns (params for
    ``zoe_head.ZoeMetricHead{Single,Multi}``, "single" | "nk"). Strict:
    every head key must be consumed; unknown keys raise.
    """
    used = set()
    p: dict = {"conv2": _take_pair(sd, used, "conv2")}
    is_nk = any(k.startswith("patch_transformer.") for k in sd)

    if not is_nk:
        p["seed_bin_regressor"] = _take_net(sd, used, "seed_bin_regressor")
        p["seed_projector"] = _take_net(sd, used, "seed_projector")
        for i in range(4):
            p[f"projector_{i}"] = _take_net(sd, used, f"projectors.{i}")
            p[f"attractor_{i}"] = _take_net(sd, used, f"attractors.{i}")
        p["conditional_log_binomial"] = {
            "mlp0": _take_pair(sd, used, "conditional_log_binomial.mlp.0"),
            "mlp2": _take_pair(sd, used, "conditional_log_binomial.mlp.2"),
        }
    else:
        pt = {
            "embedding_convPxP": _take_pair(
                sd, used, "patch_transformer.embedding_convPxP"
            )
        }
        for i in range(4):
            b = f"patch_transformer.transformer_encoder.layers.{i}."
            w = sd[b + "self_attn.in_proj_weight"]
            used.update({b + "self_attn.in_proj_weight",
                         b + "self_attn.in_proj_bias"})
            pt[f"layer_{i}"] = {
                "in_proj_kernel": _t_linear(w),
                "in_proj_bias": sd[b + "self_attn.in_proj_bias"],
                "out_proj": _take_pair(
                    sd, used, b + "self_attn.out_proj", kind="linear"
                ),
                "linear1": _take_pair(sd, used, b + "linear1", kind="linear"),
                "linear2": _take_pair(sd, used, b + "linear2", kind="linear"),
                "norm1": {"scale": sd[b + "norm1.weight"],
                          "bias": sd[b + "norm1.bias"]},
                "norm2": {"scale": sd[b + "norm2.weight"],
                          "bias": sd[b + "norm2.bias"]},
            }
            used.update({b + "norm1.weight", b + "norm1.bias",
                         b + "norm2.weight", b + "norm2.bias"})
        p["patch_transformer"] = pt
        p["mlp_classifier_0"] = _take_pair(
            sd, used, "mlp_classifier.0", kind="linear"
        )
        p["mlp_classifier_2"] = _take_pair(
            sd, used, "mlp_classifier.2", kind="linear"
        )
        p["seed_projector"] = _take_net(sd, used, "seed_projector")
        for i in range(4):
            p[f"projector_{i}"] = _take_net(sd, used, f"projectors.{i}")
        for name in ("nyu", "kitti"):
            p[f"seed_bin_regressor_{name}"] = _take_net(
                sd, used, f"seed_bin_regressors.{name}"
            )
            for i in range(4):
                p[f"attractor_{name}_{i}"] = _take_net(
                    sd, used, f"attractors.{name}.{i}"
                )
            p[f"conditional_log_binomial_{name}"] = {
                "mlp0": _take_pair(
                    sd, used, f"conditional_log_binomial.{name}.mlp.0"
                ),
                "mlp2": _take_pair(
                    sd, used, f"conditional_log_binomial.{name}.mlp.2"
                ),
            }

    unknown = [k for k in sd if k not in used]
    if unknown:
        raise ValueError(f"unrecognized head keys: {unknown[:8]}")
    return p, ("nk" if is_nk else "single")


def load_zoe_checkpoint(path: str, depth: int = 24):
    """Load a ZoeD_M12_*.pt: returns (backbone_params, head_params, variant).

    The full checkpoint splits into the MiDaS core (``core[.core]
    .pretrained/scratch.*`` -> DPTBeitBackbone) and the metric-bins head
    (everything else -> ZoeMetricHead{Single,Multi}); both sides enforce
    strict key coverage, so a layout drift raises instead of silently
    running random weights.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("model", obj) if isinstance(obj, dict) else obj
    sd = {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    backbone_sd, head_sd = {}, {}
    for k, v in sd.items():
        body = k
        for pre in ("core.core.", "core."):
            if body.startswith(pre):
                body = body[len(pre):]
                break
        if body.startswith(("pretrained.", "scratch.")):
            backbone_sd[k] = v
        else:
            head_sd[body] = v
    backbone, dropped = port_dpt_beit(backbone_sd, depth=depth)
    head, variant = port_zoe_head(head_sd)
    return backbone, head, variant

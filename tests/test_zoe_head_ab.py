"""ZoeDepth metric-head A/B vs the HF `transformers` torch port.

The HF ZoeDepth implementation is output-parity-verified against the
original isl-org release, so it serves as a CPU oracle for the head math
that the released ``ZoeD_M12_*.pt`` checkpoints were trained with
(reference consumer: ``pgdvs/preprocess/compute_zoedepth.py:146-166``).

Random weights, f32; asserts the flax heads in
``pgdvs_tpu.models.depth.zoe_head`` reproduce
``ZoeDepthMetricDepthEstimationHead`` (single, N/K) and
``ZoeDepthMultipleMetricDepthEstimationHeads`` (NK) including the
align-corners resizes, the attractor default-alpha quirk, the conditional
log-binomial, and the NK patch-transformer domain routing.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from transformers.models.zoedepth.configuration_zoedepth import ZoeDepthConfig
from transformers.models.zoedepth.modeling_zoedepth import (
    ZoeDepthMetricDepthEstimationHead,
    ZoeDepthMultipleMetricDepthEstimationHeads,
)

import jax


def _t_conv(w):
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _conv(mod):
    return {
        "kernel": _t_conv(mod.weight.detach().numpy()),
        "bias": mod.bias.detach().numpy(),
    }


def _dense(mod):
    return {
        "kernel": np.ascontiguousarray(mod.weight.detach().numpy().T),
        "bias": mod.bias.detach().numpy(),
    }


def _mlp_pair(mod):  # HF conv1/conv2 pairs
    return {"conv1": _conv(mod.conv1), "conv2": _conv(mod.conv2)}


def _single_cfg():
    return ZoeDepthConfig(
        backbone_config=None,
        backbone="beit",  # unused: we instantiate heads directly
        bottleneck_features=16,
        fusion_hidden_size=16,
        num_relative_features=8,
        bin_embedding_dim=8,
        num_attractors=[3, 2, 2, 1],
        bin_configurations=[
            {"name": "nyu", "n_bins": 6, "min_depth": 1e-3, "max_depth": 10.0}
        ],
    )


def _rand_inputs(rng, btl=16, fusion=16, rel_feats=8):
    outconv = rng.standard_normal((1, rel_feats, 16, 20), dtype=np.float32)
    bottleneck = rng.standard_normal((1, btl, 4, 5), dtype=np.float32)
    feats = [
        rng.standard_normal((1, fusion, h, w), dtype=np.float32)
        for h, w in [(4, 5), (8, 10), (16, 20), (16, 20)]
    ]
    rel = np.abs(rng.standard_normal((1, 32, 40), dtype=np.float32))
    return outconv, bottleneck, feats, rel


def _to_hwc(x):  # [1, C, H, W] -> [H, W, C]
    return np.ascontiguousarray(np.transpose(x[0], (1, 2, 0)))


def test_single_head_matches_hf():
    from pgdvs_tpu.models.depth.zoe_head import ZoeMetricHeadSingle

    cfg = _single_cfg()
    torch.manual_seed(0)
    head = ZoeDepthMetricDepthEstimationHead(cfg).eval()
    rng = np.random.default_rng(0)
    outconv, bottleneck, feats, rel = _rand_inputs(rng)
    with torch.no_grad():
        ref, _ = head(
            torch.from_numpy(outconv),
            torch.from_numpy(bottleneck),
            [torch.from_numpy(f) for f in feats],
            torch.from_numpy(rel),
        )
    ref = ref.numpy()[0, 0]

    params = {
        "conv2": _conv(head.conv2),
        "seed_bin_regressor": _mlp_pair(head.seed_bin_regressor),
        "seed_projector": _mlp_pair(head.seed_projector),
        "conditional_log_binomial": {
            "mlp0": _conv(head.conditional_log_binomial.mlp[0]),
            "mlp2": _conv(head.conditional_log_binomial.mlp[2]),
        },
    }
    for i in range(4):
        params[f"projector_{i}"] = _mlp_pair(head.projectors[i])
        params[f"attractor_{i}"] = _mlp_pair(head.attractors[i])

    model = ZoeMetricHeadSingle(
        n_bins=6, min_depth=1e-3, max_depth=10.0, bin_embedding_dim=8,
        n_attractors=(3, 2, 2, 1), num_relative_features=8,
    )
    out = model.apply(
        {"params": jax.tree_util.tree_map(np.asarray, params)},
        _to_hwc(outconv), _to_hwc(bottleneck),
        [_to_hwc(f) for f in feats], rel[0],
    )
    np.testing.assert_allclose(np.asarray(out)[..., 0], ref, rtol=2e-4, atol=2e-5)


def _nk_cfg():
    return ZoeDepthConfig(
        backbone_config=None,
        backbone="beit",
        bottleneck_features=16,
        fusion_hidden_size=16,
        num_relative_features=8,
        bin_embedding_dim=8,
        num_attractors=[3, 2, 2, 1],
        bin_configurations=[
            {"name": "nyu", "n_bins": 6, "min_depth": 1e-3, "max_depth": 10.0},
            {"name": "kitti", "n_bins": 6, "min_depth": 1e-3, "max_depth": 80.0},
        ],
        num_patch_transformer_layers=4,
        patch_transformer_hidden_size=128,
        patch_transformer_intermediate_size=64,
        patch_transformer_num_attention_heads=4,
    )


def test_nk_head_matches_hf():
    from pgdvs_tpu.models.depth.zoe_head import ZoeMetricHeadMulti

    cfg = _nk_cfg()
    torch.manual_seed(1)
    head = ZoeDepthMultipleMetricDepthEstimationHeads(cfg).eval()
    rng = np.random.default_rng(1)
    outconv, bottleneck, feats, rel = _rand_inputs(rng)
    with torch.no_grad():
        ref, ref_logits = head(
            torch.from_numpy(outconv),
            torch.from_numpy(bottleneck),
            [torch.from_numpy(f) for f in feats],
            torch.from_numpy(rel),
        )
    ref = ref.numpy()[0, 0]
    ref_logits = ref_logits.numpy()[0]

    params = {
        "conv2": _conv(head.conv2),
        "seed_projector": _mlp_pair(head.seed_projector),
        "mlp_classifier_0": _dense(head.mlp_classifier.linear1),
        "mlp_classifier_2": _dense(head.mlp_classifier.linear2),
    }
    pt = {"embedding_convPxP": _conv(head.patch_transformer.embedding_convPxP)}
    for i, layer in enumerate(head.patch_transformer.transformer_encoder):
        attn = layer.self_attn
        in_proj_k = np.concatenate(
            [
                attn.query.weight.detach().numpy(),
                attn.key.weight.detach().numpy(),
                attn.value.weight.detach().numpy(),
            ],
            axis=0,
        ).T  # original packed layout, flax [E, 3E]
        in_proj_b = np.concatenate(
            [
                attn.query.bias.detach().numpy(),
                attn.key.bias.detach().numpy(),
                attn.value.bias.detach().numpy(),
            ]
        )
        pt[f"layer_{i}"] = {
            "in_proj_kernel": np.ascontiguousarray(in_proj_k),
            "in_proj_bias": in_proj_b,
            "out_proj": _dense(attn.out_proj),
            "linear1": _dense(layer.linear1),
            "linear2": _dense(layer.linear2),
            "norm1": {
                "scale": layer.norm1.weight.detach().numpy(),
                "bias": layer.norm1.bias.detach().numpy(),
            },
            "norm2": {
                "scale": layer.norm2.weight.detach().numpy(),
                "bias": layer.norm2.bias.detach().numpy(),
            },
        }
    params["patch_transformer"] = pt
    for i in range(4):
        params[f"projector_{i}"] = _mlp_pair(head.projectors[i])
    for name in ("nyu", "kitti"):
        params[f"seed_bin_regressor_{name}"] = _mlp_pair(
            head.seed_bin_regressors[name]
        )
        for i in range(4):
            params[f"attractor_{name}_{i}"] = _mlp_pair(
                head.attractors[name][i]
            )
        params[f"conditional_log_binomial_{name}"] = {
            "mlp0": _conv(head.conditional_log_binomial[name].mlp[0]),
            "mlp2": _conv(head.conditional_log_binomial[name].mlp[2]),
        }

    model = ZoeMetricHeadMulti(
        bin_confs=(
            {"name": "nyu", "n_bins": 6, "min_depth": 1e-3, "max_depth": 10.0},
            {"name": "kitti", "n_bins": 6, "min_depth": 1e-3,
             "max_depth": 80.0},
        ),
        bin_embedding_dim=8,
        n_attractors=(3, 2, 2, 1),
        num_relative_features=8,
        patch_transformer_intermediate=64,
    )
    out, logits = model.apply(
        {"params": jax.tree_util.tree_map(np.asarray, params)},
        _to_hwc(outconv), _to_hwc(bottleneck),
        [_to_hwc(f) for f in feats], rel[0],
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out)[..., 0], ref, rtol=2e-4,
                               atol=2e-5)


# ---------------------------------------------------------------------------
# Port-mapping A/B: HF weights -> ORIGINAL isl-org checkpoint key layout ->
# zoe_port.port_zoe_head -> flax — proves the checkpoint port itself, not
# just the module math.
# ---------------------------------------------------------------------------


def _np(t):
    return t.detach().numpy()


def _orig_net(sd, base, mod):
    sd[base + "._net.0.weight"] = _np(mod.conv1.weight)
    sd[base + "._net.0.bias"] = _np(mod.conv1.bias)
    sd[base + "._net.2.weight"] = _np(mod.conv2.weight)
    sd[base + "._net.2.bias"] = _np(mod.conv2.bias)


def _hf_single_to_original_sd(head):
    sd = {
        "conv2.weight": _np(head.conv2.weight),
        "conv2.bias": _np(head.conv2.bias),
        "conditional_log_binomial.mlp.0.weight":
            _np(head.conditional_log_binomial.mlp[0].weight),
        "conditional_log_binomial.mlp.0.bias":
            _np(head.conditional_log_binomial.mlp[0].bias),
        "conditional_log_binomial.mlp.2.weight":
            _np(head.conditional_log_binomial.mlp[2].weight),
        "conditional_log_binomial.mlp.2.bias":
            _np(head.conditional_log_binomial.mlp[2].bias),
    }
    _orig_net(sd, "seed_bin_regressor", head.seed_bin_regressor)
    _orig_net(sd, "seed_projector", head.seed_projector)
    for i in range(4):
        _orig_net(sd, f"projectors.{i}", head.projectors[i])
        _orig_net(sd, f"attractors.{i}", head.attractors[i])
    return sd


def _hf_nk_to_original_sd(head):
    sd = {
        "conv2.weight": _np(head.conv2.weight),
        "conv2.bias": _np(head.conv2.bias),
        "patch_transformer.embedding_convPxP.weight":
            _np(head.patch_transformer.embedding_convPxP.weight),
        "patch_transformer.embedding_convPxP.bias":
            _np(head.patch_transformer.embedding_convPxP.bias),
        "mlp_classifier.0.weight": _np(head.mlp_classifier.linear1.weight),
        "mlp_classifier.0.bias": _np(head.mlp_classifier.linear1.bias),
        "mlp_classifier.2.weight": _np(head.mlp_classifier.linear2.weight),
        "mlp_classifier.2.bias": _np(head.mlp_classifier.linear2.bias),
    }
    for i, layer in enumerate(head.patch_transformer.transformer_encoder):
        b = f"patch_transformer.transformer_encoder.layers.{i}."
        attn = layer.self_attn
        sd[b + "self_attn.in_proj_weight"] = np.concatenate(
            [_np(attn.query.weight), _np(attn.key.weight),
             _np(attn.value.weight)], axis=0,
        )
        sd[b + "self_attn.in_proj_bias"] = np.concatenate(
            [_np(attn.query.bias), _np(attn.key.bias), _np(attn.value.bias)]
        )
        sd[b + "self_attn.out_proj.weight"] = _np(attn.out_proj.weight)
        sd[b + "self_attn.out_proj.bias"] = _np(attn.out_proj.bias)
        for nm in ("linear1", "linear2", "norm1", "norm2"):
            sd[b + nm + ".weight"] = _np(getattr(layer, nm).weight)
            sd[b + nm + ".bias"] = _np(getattr(layer, nm).bias)
    _orig_net(sd, "seed_projector", head.seed_projector)
    for i in range(4):
        _orig_net(sd, f"projectors.{i}", head.projectors[i])
    for name in ("nyu", "kitti"):
        _orig_net(sd, f"seed_bin_regressors.{name}",
                  head.seed_bin_regressors[name])
        for i in range(4):
            _orig_net(sd, f"attractors.{name}.{i}", head.attractors[name][i])
        sd[f"conditional_log_binomial.{name}.mlp.0.weight"] = _np(
            head.conditional_log_binomial[name].mlp[0].weight)
        sd[f"conditional_log_binomial.{name}.mlp.0.bias"] = _np(
            head.conditional_log_binomial[name].mlp[0].bias)
        sd[f"conditional_log_binomial.{name}.mlp.2.weight"] = _np(
            head.conditional_log_binomial[name].mlp[2].weight)
        sd[f"conditional_log_binomial.{name}.mlp.2.bias"] = _np(
            head.conditional_log_binomial[name].mlp[2].bias)
    return sd


def test_port_zoe_head_single_roundtrip():
    from pgdvs_tpu.models.depth.zoe_head import ZoeMetricHeadSingle
    from pgdvs_tpu.models.depth.zoe_port import port_zoe_head

    torch.manual_seed(3)
    head = ZoeDepthMetricDepthEstimationHead(_single_cfg()).eval()
    params, variant = port_zoe_head(_hf_single_to_original_sd(head))
    assert variant == "single"

    rng = np.random.default_rng(3)
    outconv, bottleneck, feats, rel = _rand_inputs(rng)
    with torch.no_grad():
        ref, _ = head(
            torch.from_numpy(outconv), torch.from_numpy(bottleneck),
            [torch.from_numpy(f) for f in feats], torch.from_numpy(rel),
        )
    model = ZoeMetricHeadSingle(
        n_bins=6, min_depth=1e-3, max_depth=10.0, bin_embedding_dim=8,
        n_attractors=(3, 2, 2, 1), num_relative_features=8,
    )
    out = model.apply({"params": params}, _to_hwc(outconv),
                      _to_hwc(bottleneck), [_to_hwc(f) for f in feats],
                      rel[0])
    np.testing.assert_allclose(
        np.asarray(out)[..., 0], ref.numpy()[0, 0], rtol=2e-4, atol=2e-5
    )


def test_port_zoe_head_nk_roundtrip():
    from pgdvs_tpu.models.depth.zoe_head import ZoeMetricHeadMulti
    from pgdvs_tpu.models.depth.zoe_port import port_zoe_head

    torch.manual_seed(4)
    head = ZoeDepthMultipleMetricDepthEstimationHeads(_nk_cfg()).eval()
    params, variant = port_zoe_head(_hf_nk_to_original_sd(head))
    assert variant == "nk"

    rng = np.random.default_rng(4)
    outconv, bottleneck, feats, rel = _rand_inputs(rng)
    with torch.no_grad():
        ref, ref_logits = head(
            torch.from_numpy(outconv), torch.from_numpy(bottleneck),
            [torch.from_numpy(f) for f in feats], torch.from_numpy(rel),
        )
    model = ZoeMetricHeadMulti(
        bin_confs=(
            {"name": "nyu", "n_bins": 6, "min_depth": 1e-3,
             "max_depth": 10.0},
            {"name": "kitti", "n_bins": 6, "min_depth": 1e-3,
             "max_depth": 80.0},
        ),
        bin_embedding_dim=8, n_attractors=(3, 2, 2, 1),
        num_relative_features=8, patch_transformer_intermediate=64,
    )
    out, logits = model.apply({"params": params}, _to_hwc(outconv),
                              _to_hwc(bottleneck),
                              [_to_hwc(f) for f in feats], rel[0])
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy()[0],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out)[..., 0], ref.numpy()[0, 0],
                               rtol=2e-4, atol=2e-5)


def test_port_zoe_head_rejects_unknown_keys():
    from pgdvs_tpu.models.depth.zoe_port import port_zoe_head

    torch.manual_seed(5)
    head = ZoeDepthMetricDepthEstimationHead(_single_cfg()).eval()
    sd = _hf_single_to_original_sd(head)
    sd["mystery.module.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="unrecognized head keys"):
        port_zoe_head(sd)

"""Full-chain DPT-BEiT A/B vs the HF `transformers` ZoeDepth model.

`ZoeDepthForDepthEstimation` (BeitBackbone + neck + relative head + metric
head) is output-parity-verified against the original isl-org/MiDaS release,
so it serves as a CPU oracle for the ENTIRE checkpoint path: the test maps
its random weights into the ORIGINAL ZoeD_M12 key layout, loads them via
``zoe_port.load_zoe_checkpoint``, and asserts the flax backbone+head chain
reproduces the torch metric depth at the model's native output resolution.
This covers every numerical detail at once: BEiT rel-pos attention,
layer-scale, readout projection, reassemble/deconv, fusion blocks, relative
head, and the metric-bins head.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from transformers import BeitConfig
from transformers.models.zoedepth.configuration_zoedepth import ZoeDepthConfig
from transformers.models.zoedepth.modeling_zoedepth import (
    ZoeDepthForDepthEstimation,
)

import jax
import jax.numpy as jnp

from tests.test_zoe_head_ab import _hf_single_to_original_sd

DIM, DEPTH, HEADS, GRID = 32, 6, 4, (4, 4)
HOOKS = (1, 2, 4, 5)  # timm block indices -> HF out_indices (k+1)
FEATS = 16
REASM = (16, 24, 32, 32)
HEAD_F = (8, 4)


def _tiny_model():
    beit = BeitConfig(
        hidden_size=DIM,
        num_hidden_layers=DEPTH,
        num_attention_heads=HEADS,
        intermediate_size=2 * DIM,
        image_size=16 * GRID[0],
        patch_size=16,
        use_relative_position_bias=True,
        use_absolute_position_embeddings=False,
        layer_scale_init_value=0.1,
        out_indices=[h + 1 for h in HOOKS],
        reshape_hidden_states=False,
    )
    cfg = ZoeDepthConfig(
        backbone_config=beit,
        neck_hidden_sizes=list(REASM),
        fusion_hidden_size=FEATS,
        num_relative_features=HEAD_F[1],
        bottleneck_features=FEATS,
        bin_embedding_dim=8,
        num_attractors=[3, 2, 2, 1],
        bin_configurations=[
            {"name": "nyu", "n_bins": 6, "min_depth": 1e-3, "max_depth": 10.0}
        ],
    )
    model = ZoeDepthForDepthEstimation(cfg).eval()
    gen = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    return model


def _np(t):
    return t.detach().numpy()


def _hf_to_original_sd(model):
    """HF ZoeDepthForDepthEstimation params -> original ZoeD_M12 key layout
    (the inverse of HF's own conversion renames)."""
    sd = {}
    pm = "core.core.pretrained.model."
    bb = model.backbone
    sd[pm + "cls_token"] = _np(bb.embeddings.cls_token)
    sd[pm + "patch_embed.proj.weight"] = _np(
        bb.embeddings.patch_embeddings.projection.weight
    )
    sd[pm + "patch_embed.proj.bias"] = _np(
        bb.embeddings.patch_embeddings.projection.bias
    )
    for i, layer in enumerate(bb.encoder.layer):
        b = f"{pm}blocks.{i}."
        attn = layer.attention.attention
        sd[b + "attn.qkv.weight"] = np.concatenate(
            [_np(attn.query.weight), _np(attn.key.weight),
             _np(attn.value.weight)], axis=0,
        )
        sd[b + "attn.q_bias"] = _np(attn.query.bias)
        sd[b + "attn.v_bias"] = _np(attn.value.bias)
        sd[b + "attn.relative_position_bias_table"] = _np(
            attn.relative_position_bias.relative_position_bias_table
        )
        sd[b + "attn.proj.weight"] = _np(layer.attention.output.dense.weight)
        sd[b + "attn.proj.bias"] = _np(layer.attention.output.dense.bias)
        sd[b + "norm1.weight"] = _np(layer.layernorm_before.weight)
        sd[b + "norm1.bias"] = _np(layer.layernorm_before.bias)
        sd[b + "norm2.weight"] = _np(layer.layernorm_after.weight)
        sd[b + "norm2.bias"] = _np(layer.layernorm_after.bias)
        sd[b + "gamma_1"] = _np(layer.lambda_1)
        sd[b + "gamma_2"] = _np(layer.lambda_2)
        sd[b + "mlp.fc1.weight"] = _np(layer.intermediate.dense.weight)
        sd[b + "mlp.fc1.bias"] = _np(layer.intermediate.dense.bias)
        sd[b + "mlp.fc2.weight"] = _np(layer.output.dense.weight)
        sd[b + "mlp.fc2.bias"] = _np(layer.output.dense.bias)

    neck = model.neck
    for n in range(1, 5):
        ap = f"core.core.pretrained.act_postprocess{n}."
        proj = neck.reassemble_stage.readout_projects[n - 1][0]
        sd[ap + "0.project.0.weight"] = _np(proj.weight)
        sd[ap + "0.project.0.bias"] = _np(proj.bias)
        layer = neck.reassemble_stage.layers[n - 1]
        sd[ap + "3.weight"] = _np(layer.projection.weight)
        sd[ap + "3.bias"] = _np(layer.projection.bias)
        if n in (1, 2, 4):  # factor 4/2 deconv, factor 0.5 strided conv
            sd[ap + "4.weight"] = _np(layer.resize.weight)
            sd[ap + "4.bias"] = _np(layer.resize.bias)
    for n in range(1, 5):
        sd[f"core.core.scratch.layer{n}_rn.weight"] = _np(
            neck.convs[n - 1].weight
        )
        # fusion layer j corresponds to refinenet (4 - j)
        fl = neck.fusion_stage.layers[4 - n]
        rf = f"core.core.scratch.refinenet{n}."
        sd[rf + "out_conv.weight"] = _np(fl.projection.weight)
        sd[rf + "out_conv.bias"] = _np(fl.projection.bias)
        for unit, src in (("resConfUnit1", fl.residual_layer1),
                          ("resConfUnit2", fl.residual_layer2)):
            sd[rf + f"{unit}.conv1.weight"] = _np(src.convolution1.weight)
            sd[rf + f"{unit}.conv1.bias"] = _np(src.convolution1.bias)
            sd[rf + f"{unit}.conv2.weight"] = _np(src.convolution2.weight)
            sd[rf + f"{unit}.conv2.bias"] = _np(src.convolution2.bias)

    rh = model.relative_head
    sd["core.core.scratch.output_conv.0.weight"] = _np(rh.conv1.weight)
    sd["core.core.scratch.output_conv.0.bias"] = _np(rh.conv1.bias)
    sd["core.core.scratch.output_conv.2.weight"] = _np(rh.conv2.weight)
    sd["core.core.scratch.output_conv.2.bias"] = _np(rh.conv2.bias)
    sd["core.core.scratch.output_conv.4.weight"] = _np(rh.conv3.weight)
    sd["core.core.scratch.output_conv.4.bias"] = _np(rh.conv3.bias)

    sd.update(_hf_single_to_original_sd(model.metric_head))
    return sd


def test_full_chain_matches_hf(tmp_path):
    from pgdvs_tpu.models.depth.dpt_beit import DPTBeitBackbone
    from pgdvs_tpu.models.depth.zoe_head import ZoeMetricHeadSingle
    from pgdvs_tpu.models.depth.zoe_port import load_zoe_checkpoint

    model = _tiny_model()
    sd = _hf_to_original_sd(model)
    ckpt = tmp_path / "ZoeD_tiny_hf.pt"
    torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in sd.items()}}, ckpt)
    backbone, head, variant = load_zoe_checkpoint(str(ckpt), depth=DEPTH)
    assert variant == "single"

    rng = np.random.default_rng(0)
    h = w = 16 * GRID[0]
    x = rng.standard_normal((h, w, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        out = model(
            torch.from_numpy(np.transpose(x, (2, 0, 1))[None])
        )
    ref = out.predicted_depth.numpy()[0]

    bb = DPTBeitBackbone(
        embed_dim=DIM, depth=DEPTH, n_heads=HEADS, mlp_ratio=2.0, patch=16,
        hooks=HOOKS, features=FEATS, reassemble_channels=REASM,
        pretrained_grid=GRID, head_features=HEAD_F,
    )
    as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
    rel, outconv, l4_rn, pyramid = bb.apply(
        {"params": as_jnp(backbone)}, jnp.asarray(x)
    )
    depth = ZoeMetricHeadSingle(
        n_bins=6, min_depth=1e-3, max_depth=10.0, bin_embedding_dim=8,
        n_attractors=(3, 2, 2, 1), num_relative_features=HEAD_F[1],
    ).apply({"params": as_jnp(head)}, outconv, l4_rn, pyramid, rel)

    got = np.asarray(depth)[..., 0]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-5)

"""DPT-BEiT backbone: structure, key-map coverage, oracle checks.

The released ZoeD_M12_*.pt cannot be provisioned in this environment, so
the port is validated structurally: a synthetic state dict with the FULL
published key layout (timm beit + MiDaS DPT, the compute_zoedepth.py
contract) must port bijectively onto a fresh init's pytree, and the
resulting params must run end-to-end through the metric-bins head. The
pure-math pieces (relative-position index, align_corners resize, deconv
semantics) are checked against torch oracles.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# tiny config: dim 32, 6 blocks, hooks spread, pretrained grid 4x4
DIM, DEPTH, HEADS, GRID = 32, 6, 4, (4, 4)
HOOKS = (1, 2, 4, 5)
FEATS = 16
REASM = (16, 24, 32, 32)
HEAD_F = (8, 4)


def _backbone(**kw):
    from pgdvs_tpu.models.depth.dpt_beit import DPTBeitBackbone

    return DPTBeitBackbone(
        embed_dim=DIM, depth=DEPTH, n_heads=HEADS, mlp_ratio=2.0, patch=16,
        hooks=HOOKS, features=FEATS, reassemble_channels=REASM,
        pretrained_grid=GRID, head_features=HEAD_F, **kw
    )


def _fake_midas_sd(rng):
    """Published ZoeD/MiDaS key layout at the tiny test dims."""
    sd = {}

    def add(name, *shape):
        sd["core.core." + name] = rng.normal(size=shape).astype(np.float32) * 0.05

    pm = "pretrained.model."
    add(pm + "cls_token", 1, 1, DIM)
    add(pm + "patch_embed.proj.weight", DIM, 3, 16, 16)
    add(pm + "patch_embed.proj.bias", DIM)
    n_rel = (2 * GRID[0] - 1) * (2 * GRID[1] - 1) + 3
    for i in range(DEPTH):
        b = f"{pm}blocks.{i}."
        add(b + "norm1.weight", DIM)
        add(b + "norm1.bias", DIM)
        add(b + "norm2.weight", DIM)
        add(b + "norm2.bias", DIM)
        add(b + "gamma_1", DIM)
        add(b + "gamma_2", DIM)
        add(b + "attn.qkv.weight", 3 * DIM, DIM)
        add(b + "attn.q_bias", DIM)
        add(b + "attn.v_bias", DIM)
        add(b + "attn.relative_position_bias_table", n_rel, HEADS)
        ntok = GRID[0] * GRID[1] + 1
        sd[f"core.core.{b}attn.relative_position_index"] = np.zeros(
            (ntok, ntok), np.int64
        )  # buffer: must be dropped by the port
        add(b + "attn.proj.weight", DIM, DIM)
        add(b + "attn.proj.bias", DIM)
        add(b + "mlp.fc1.weight", 2 * DIM, DIM)
        add(b + "mlp.fc1.bias", 2 * DIM)
        add(b + "mlp.fc2.weight", DIM, 2 * DIM)
        add(b + "mlp.fc2.bias", DIM)
    # timm final norm present in checkpoints, unused by DPT hooks
    add(pm + "norm.weight", DIM)
    add(pm + "norm.bias", DIM)

    for n in range(1, 5):
        ap = f"pretrained.act_postprocess{n}."
        add(ap + "0.project.0.weight", DIM, 2 * DIM)
        add(ap + "0.project.0.bias", DIM)
        add(ap + "3.weight", REASM[n - 1], DIM, 1, 1)
        add(ap + "3.bias", REASM[n - 1])
        if n == 1:
            add(ap + "4.weight", REASM[0], REASM[0], 4, 4)
            add(ap + "4.bias", REASM[0])
        elif n == 2:
            add(ap + "4.weight", REASM[1], REASM[1], 2, 2)
            add(ap + "4.bias", REASM[1])
        elif n == 4:
            add(ap + "4.weight", REASM[3], REASM[3], 3, 3)
            add(ap + "4.bias", REASM[3])

    for n in range(1, 5):
        add(f"scratch.layer{n}_rn.weight", FEATS, REASM[n - 1], 3, 3)
        rf = f"scratch.refinenet{n}."
        for unit in ("resConfUnit1", "resConfUnit2"):
            for conv in ("conv1", "conv2"):
                add(rf + f"{unit}.{conv}.weight", FEATS, FEATS, 3, 3)
                add(rf + f"{unit}.{conv}.bias", FEATS)
        add(rf + "out_conv.weight", FEATS, FEATS, 1, 1)
        add(rf + "out_conv.bias", FEATS)

    add("scratch.output_conv.0.weight", HEAD_F[0], FEATS, 3, 3)
    add("scratch.output_conv.0.bias", HEAD_F[0])
    add("scratch.output_conv.2.weight", HEAD_F[1], HEAD_F[0], 3, 3)
    add("scratch.output_conv.2.bias", HEAD_F[1])
    add("scratch.output_conv.4.weight", 1, HEAD_F[1], 1, 1)
    add("scratch.output_conv.4.bias", 1)
    return sd


def test_port_key_coverage_and_structure():
    from pgdvs_tpu.models.depth.zoe_port import port_dpt_beit

    rng = np.random.default_rng(0)
    sd = _fake_midas_sd(rng)
    ported, dropped = port_dpt_beit(sd, depth=DEPTH)
    # only the buffers / final norm may be dropped
    assert all(
        "relative_position_index" in k or ".norm." in k for k in dropped
    ), dropped

    model = _backbone()
    img = jnp.zeros((64, 64, 3))
    init = model.init(jax.random.PRNGKey(0), img)["params"]
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, init)
    got_shapes = jax.tree_util.tree_map(lambda x: tuple(x.shape), ported)
    rf, rd = jax.tree_util.tree_flatten(ref_shapes)
    gf, gd = jax.tree_util.tree_flatten(got_shapes)
    assert rd == gd, f"pytree mismatch:\n{rd}\nvs\n{gd}"
    assert rf == gf, list(zip(rf, gf))[:5]

    # a corrupted key must raise, not silently drop
    bad = dict(sd)
    bad["core.core.pretrained.model.blocks.0.attn.surprise"] = np.zeros(3)
    with pytest.raises(ValueError):
        port_dpt_beit(bad, depth=DEPTH)


def _fake_zoe_head_sd(rng, n_bins=16, emb=32):
    """Original zoedepth.py single-head key layout at the tiny test dims."""
    sd = {}

    def add(name, *shape):
        sd[name] = rng.normal(size=shape).astype(np.float32) * 0.05

    def net(base, cin, mid, cout):
        add(base + "._net.0.weight", mid, cin, 1, 1)
        add(base + "._net.0.bias", mid)
        add(base + "._net.2.weight", cout, mid, 1, 1)
        add(base + "._net.2.bias", cout)

    add("conv2.weight", FEATS, FEATS, 1, 1)
    add("conv2.bias", FEATS)
    net("seed_bin_regressor", FEATS, 256, n_bins)
    net("seed_projector", FEATS, 128, emb)
    for i, n_attr in enumerate((16, 8, 4, 1)):
        net(f"projectors.{i}", FEATS, 128, emb)
        net(f"attractors.{i}", emb, emb, n_attr)
    clb_in = HEAD_F[1] + 1 + emb
    clb_mid = (HEAD_F[1] + 1 + emb) // 2
    add("conditional_log_binomial.mlp.0.weight", clb_mid, clb_in, 1, 1)
    add("conditional_log_binomial.mlp.0.bias", clb_mid)
    add("conditional_log_binomial.mlp.2.weight", 4, clb_mid, 1, 1)
    add("conditional_log_binomial.mlp.2.bias", 4)
    return sd


def test_ported_params_run_e2e_through_metric_head(tmp_path):
    """Full load path: a synthetic ZoeD_M12-layout checkpoint (backbone AND
    metric head) loads via load_zoe_checkpoint and predicts positive finite
    depth — no module is left on random init."""
    torch = pytest.importorskip("torch")
    from pgdvs_tpu.models.depth.dpt_beit import ZoeDepthDPT
    from pgdvs_tpu.models.depth.zoe_port import load_zoe_checkpoint

    rng = np.random.default_rng(1)
    sd = _fake_midas_sd(rng)
    sd.update(_fake_zoe_head_sd(rng))
    ckpt = tmp_path / "ZoeD_tiny.pt"
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}}, ckpt)

    backbone, head, variant = load_zoe_checkpoint(str(ckpt), depth=DEPTH)
    assert variant == "single"

    model = ZoeDepthDPT(
        n_bins=16,
        backbone_kwargs=dict(
            embed_dim=DIM, depth=DEPTH, n_heads=HEADS, mlp_ratio=2.0,
            patch=16, hooks=HOOKS, features=FEATS,
            reassemble_channels=REASM, pretrained_grid=GRID,
            head_features=HEAD_F,
        ),
        head_kwargs=dict(bin_embedding_dim=32,
                         num_relative_features=HEAD_F[1]),
    )
    img = jnp.asarray(rng.uniform(0, 1, (64, 96, 3)).astype(np.float32))
    params = {"params": {"midas": ported_tree(backbone),
                         "head": ported_tree(head)}}
    depth = model.apply(params, img)
    assert depth.shape == (64, 96)
    assert np.isfinite(np.asarray(depth)).all()
    assert (np.asarray(depth) > 0).all()


def ported_tree(t):
    return jax.tree_util.tree_map(jnp.asarray, t)


def test_rel_pos_index_matches_timm_formula():
    torch = pytest.importorskip("torch")
    from pgdvs_tpu.models.depth.dpt_beit import gen_relative_position_index

    h, w = 3, 4
    # independent torch implementation (timm beit gen_relative_position_index)
    num_rel = (2 * h - 1) * (2 * w - 1) + 3
    coords = torch.stack(
        torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    )
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    n = h * w
    idx = torch.zeros((n + 1, n + 1), dtype=torch.long)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel - 3
    idx[0:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1

    np.testing.assert_array_equal(
        gen_relative_position_index(h, w), idx.numpy()
    )


def test_align_corners_resize_matches_torch():
    torch = pytest.importorskip("torch")
    from pgdvs_tpu.models.depth.dpt_beit import _resize_bilinear_ac

    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (5, 7, 3)).astype(np.float32)
    got = np.asarray(_resize_bilinear_ac(jnp.asarray(x), 10, 14))
    ref = (
        torch.nn.functional.interpolate(
            torch.tensor(x.transpose(2, 0, 1))[None],
            size=(10, 14),
            mode="bilinear",
            align_corners=True,
        )[0]
        .permute(1, 2, 0)
        .numpy()
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_deconv_matches_torch_convtranspose():
    torch = pytest.importorskip("torch")
    from pgdvs_tpu.models.depth.dpt_beit import _DeconvBlock

    rng = np.random.default_rng(3)
    cin, cout, k = 6, 5, 4
    x = rng.normal(size=(3, 4, cin)).astype(np.float32)
    w = rng.normal(size=(cin, cout, k, k)).astype(np.float32)
    b = rng.normal(size=(cout,)).astype(np.float32)

    mod = _DeconvBlock(cout, k)
    params = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
    got = np.asarray(mod.apply(params, jnp.asarray(x)))

    tconv = torch.nn.ConvTranspose2d(cin, cout, k, stride=k)
    with torch.no_grad():
        tconv.weight.copy_(torch.tensor(w))
        tconv.bias.copy_(torch.tensor(b))
        ref = (
            tconv(torch.tensor(x.transpose(2, 0, 1))[None])[0]
            .permute(1, 2, 0)
            .numpy()
        )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

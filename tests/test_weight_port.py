"""Weight-port mapping test.

Builds a fake torch-layout state dict (keys + shapes transcribed
independently from the reference architecture) and checks the ported pytree
matches the flax init exactly in structure and shapes. This validates the
full mapping without needing the released checkpoint; numerical parity on
real weights is exercised when PGDVS_CKPT_DIR provides one.
"""

import numpy as np
import jax
import pytest

from pgdvs_tpu.models.gnt.weight_port import port_feature_net, port_gnt
from pgdvs_tpu.renderers.static_gnt import init_gnt_params, make_gnt_models


def _fake_resunet_sd():
    sd = {}
    rng = np.random.default_rng(0)

    def add(name, *shape):
        sd[name] = rng.normal(size=shape).astype(np.float32)

    add("conv1.weight", 64, 3, 7, 7)
    add("bn1.weight", 64)
    add("bn1.bias", 64)
    specs = {"layer1": (64, 64, 3), "layer2": (128, 64, 4), "layer3": (256, 128, 6)}
    for layer, (planes, in_ch, n) in specs.items():
        for i in range(n):
            cin = in_ch if i == 0 else planes
            t = f"{layer}.{i}"
            add(f"{t}.conv1.weight", planes, cin, 3, 3)
            add(f"{t}.bn1.weight", planes)
            add(f"{t}.bn1.bias", planes)
            add(f"{t}.conv2.weight", planes, planes, 3, 3)
            add(f"{t}.bn2.weight", planes)
            add(f"{t}.bn2.bias", planes)
            if i == 0:
                add(f"{t}.downsample.0.weight", planes, cin, 1, 1)
                add(f"{t}.downsample.1.weight", planes)
                add(f"{t}.downsample.1.bias", planes)
    for name, cout, cin in (
        ("upconv3.conv", 128, 256),
        ("iconv3", 128, 256),
        ("upconv2.conv", 64, 128),
        ("iconv2", 32, 128),
    ):
        add(f"{name}.conv.weight", cout, cin, 3, 3)
        add(f"{name}.conv.bias", cout)
        add(f"{name}.bn.weight", cout)
        add(f"{name}.bn.bias", cout)
    add("out_conv.weight", 32, 32, 1, 1)
    add("out_conv.bias", 32)
    return sd


def _fake_gnt_sd(depth=8, w=64, feat=32):
    sd = {}
    rng = np.random.default_rng(1)

    def add(name, *shape):
        sd[name] = rng.normal(size=shape).astype(np.float32)

    add("rgbfeat_fc.0.weight", w, feat + 3)
    add("rgbfeat_fc.0.bias", w)
    add("rgbfeat_fc.2.weight", w, w)
    add("rgbfeat_fc.2.bias", w)
    for i in range(depth):
        vt = f"view_crosstrans.{i}"
        for nm in ("attn_norm", "ff_norm"):
            add(f"{vt}.{nm}.weight", w)
            add(f"{vt}.{nm}.bias", w)
        for nm in ("q_fc", "k_fc", "v_fc"):
            add(f"{vt}.attn.{nm}.weight", w, w)
        add(f"{vt}.attn.pos_fc.0.weight", w // 8, 4)
        add(f"{vt}.attn.pos_fc.0.bias", w // 8)
        add(f"{vt}.attn.pos_fc.2.weight", w, w // 8)
        add(f"{vt}.attn.pos_fc.2.bias", w)
        add(f"{vt}.attn.attn_fc.0.weight", w // 8, w)
        add(f"{vt}.attn.attn_fc.0.bias", w // 8)
        add(f"{vt}.attn.attn_fc.2.weight", w, w // 8)
        add(f"{vt}.attn.attn_fc.2.bias", w)
        add(f"{vt}.attn.out_fc.weight", w, w)
        add(f"{vt}.attn.out_fc.bias", w)
        add(f"{vt}.ff.fc1.weight", 4 * w, w)
        add(f"{vt}.ff.fc1.bias", 4 * w)
        add(f"{vt}.ff.fc2.weight", w, 4 * w)
        add(f"{vt}.ff.fc2.bias", w)
        rt = f"view_selftrans.{i}"
        for nm in ("attn_norm", "ff_norm"):
            add(f"{rt}.{nm}.weight", w)
            add(f"{rt}.{nm}.bias", w)
        for nm in ("q_fc", "k_fc", "v_fc"):
            add(f"{rt}.attn.{nm}.weight", w, w)
        add(f"{rt}.attn.out_fc.weight", w, w)
        add(f"{rt}.attn.out_fc.bias", w)
        add(f"{rt}.ff.fc1.weight", 4 * w, w)
        add(f"{rt}.ff.fc1.bias", 4 * w)
        add(f"{rt}.ff.fc2.weight", w, 4 * w)
        add(f"{rt}.ff.fc2.bias", w)
        if i % 2 == 0:
            posenc = 3 + 3 * 2 * 10
            add(f"q_fcs.{i}.0.weight", w, w + 2 * posenc)
            add(f"q_fcs.{i}.0.bias", w)
            add(f"q_fcs.{i}.2.weight", w, w)
            add(f"q_fcs.{i}.2.bias", w)
    add("norm.weight", w)
    add("norm.bias", w)
    add("rgb_fc.weight", 3, w)
    add("rgb_fc.bias", 3)
    return sd


def test_port_matches_flax_init_structure():
    models = make_gnt_models(dtype="float32")
    init = init_gnt_params(jax.random.PRNGKey(0), *models, n_src=2)

    ported = {
        "feature_net": {"params": port_feature_net(_fake_resunet_sd())},
        "gnt": {"params": port_gnt(_fake_gnt_sd())},
    }

    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, init)
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, ported)
    ref_flat, ref_def = jax.tree_util.tree_flatten(ref_shapes)
    got_flat, got_def = jax.tree_util.tree_flatten(got_shapes)
    assert ref_def == got_def, f"pytree structure mismatch:\n{ref_def}\nvs\n{got_def}"
    assert ref_flat == got_flat, "leaf shape mismatch"


def test_ported_params_run_forward():
    import jax.numpy as jnp

    from pgdvs_tpu.renderers.config import RenderConfig
    from pgdvs_tpu.renderers.static_gnt import render_image_gnt
    from pgdvs_tpu.core import cameras

    models = make_gnt_models(dtype="float32")
    params = {
        "feature_net": {"params": port_feature_net(_fake_resunet_sd())},
        "gnt": {"params": port_gnt(_fake_gnt_sd())},
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)

    h, w = 16, 20
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 20.0
    k[0, 2], k[1, 2] = w / 2, h / 2
    cam = np.asarray(cameras.make_flat_cam(h, w, k, np.eye(4)), np.float32)
    rng = np.random.default_rng(0)
    out = jax.jit(
        lambda p: render_image_gnt(
            models,
            p,
            jnp.asarray(cam),
            jnp.asarray(np.stack([cam, cam])),
            jnp.asarray(rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32)),
            (h, w),
            jnp.asarray([1.0, 5.0]),
            RenderConfig(n_coarse_samples_per_ray=8, ray_tile=80),
        )
    )(params)
    assert np.isfinite(np.asarray(out["rgb"])).all()

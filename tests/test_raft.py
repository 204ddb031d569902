"""RAFT flax port: math-kernel oracles + structural weight-port checks.

The RAFT source is not vendored by the reference (it lives in third_parties)
and no checkpoint ships in this environment, so numeric full-network A/B is
impossible here; instead the pure-math pieces (correlation pyramid/lookup,
convex upsampling) are tested against independent numpy implementations and
the weight-port mapping is validated against a princeton-vl-layout fake
state dict covering every parameter.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_corr_pyramid_and_lookup():
    from pgdvs_tpu.models.flow.raft import build_corr_pyramid, lookup_corr

    rng = np.random.default_rng(0)
    h8, w8, c = 6, 8, 16
    f1 = rng.normal(size=(h8, w8, c)).astype(np.float32)
    f2 = rng.normal(size=(h8, w8, c)).astype(np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2))
    assert [p.shape for p in pyr] == [
        (48, 6, 8), (48, 3, 4), (48, 1, 2), (48, 0, 1),
    ] or pyr[0].shape == (48, 6, 8)

    # level-0 exactness
    ref0 = (f1.reshape(-1, c) @ f2.reshape(-1, c).T / np.sqrt(c)).reshape(
        48, 6, 8
    )
    np.testing.assert_allclose(np.asarray(pyr[0]), ref0, rtol=1e-5, atol=1e-5)

    # lookup at the identity coords: center tap of the level-0 window must
    # equal corr[(y, x), y, x]
    gy, gx = np.meshgrid(np.arange(h8), np.arange(w8), indexing="ij")
    coords = jnp.asarray(
        np.stack([gx, gy], axis=-1).astype(np.float32)
    )
    out = np.asarray(lookup_corr(pyr[:1], coords, radius=4))
    k = 9 * 9
    center = out.reshape(h8 * w8, k)[:, k // 2]
    diag = ref0.reshape(48, 48)[np.arange(48), np.arange(48)]
    np.testing.assert_allclose(center, diag, rtol=1e-5, atol=1e-5)


def test_convex_upsample_against_numpy():
    from pgdvs_tpu.models.flow.raft import convex_upsample

    rng = np.random.default_rng(1)
    h8, w8 = 3, 4
    flow = rng.normal(size=(h8, w8, 2)).astype(np.float32)
    mask = rng.normal(size=(h8, w8, 576)).astype(np.float32)
    up = np.asarray(convex_upsample(jnp.asarray(flow), jnp.asarray(mask)))
    assert up.shape == (24, 32, 2)

    # numpy reference
    m = mask.reshape(h8, w8, 9, 8, 8)
    m = np.exp(m - m.max(axis=2, keepdims=True))
    m = m / m.sum(axis=2, keepdims=True)
    f = np.pad(flow * 8.0, ((1, 1), (1, 1), (0, 0)))
    ref = np.zeros((h8, w8, 8, 8, 2), np.float32)
    for y in range(h8):
        for x in range(w8):
            for kk in range(9):
                ky, kx = kk // 3, kk % 3
                ref[y, x] += m[y, x, kk][..., None] * f[y + ky, x + kx]
    ref = ref.transpose(0, 2, 1, 3, 4).reshape(24, 32, 2)
    np.testing.assert_allclose(up, ref, rtol=1e-4, atol=1e-4)


def _fake_raft_sd():
    """princeton-vl raft-things key layout with random values."""
    rng = np.random.default_rng(2)
    sd = {}

    def add(name, *shape):
        sd["module." + name] = rng.normal(size=shape).astype(np.float32) * 0.05

    def enc(prefix, out_dim, batch):
        add(f"{prefix}.conv1.weight", 64, 3, 7, 7)
        add(f"{prefix}.conv1.bias", 64)
        if batch:
            for stat in ("weight", "bias", "running_mean"):
                add(f"{prefix}.norm1.{stat}", 64)
            sd[f"module.{prefix}.norm1.running_var"] = np.abs(
                rng.normal(size=64).astype(np.float32)
            ) + 1.0
        chans = {1: (64, 64), 2: (64, 96), 3: (96, 128)}
        for li in (1, 2, 3):
            cin, planes = chans[li]
            for bi in (0, 1):
                t = f"{prefix}.layer{li}.{bi}"
                c0 = cin if bi == 0 else planes
                add(f"{t}.conv1.weight", planes, c0, 3, 3)
                add(f"{t}.conv1.bias", planes)
                add(f"{t}.conv2.weight", planes, planes, 3, 3)
                add(f"{t}.conv2.bias", planes)
                if batch:
                    for nn_ in ("norm1", "norm2"):
                        for stat in ("weight", "bias", "running_mean"):
                            add(f"{t}.{nn_}.{stat}", planes)
                        sd[f"module.{t}.{nn_}.running_var"] = (
                            np.abs(rng.normal(size=planes).astype(np.float32))
                            + 1.0
                        )
                if bi == 0 and li > 1:
                    add(f"{t}.downsample.0.weight", planes, c0, 1, 1)
                    add(f"{t}.downsample.0.bias", planes)
                    if batch:
                        for stat in ("weight", "bias", "running_mean"):
                            add(f"{t}.downsample.1.{stat}", planes)
                        sd[f"module.{t}.downsample.1.running_var"] = (
                            np.abs(rng.normal(size=planes).astype(np.float32))
                            + 1.0
                        )
        add(f"{prefix}.conv2.weight", out_dim, 128, 1, 1)
        add(f"{prefix}.conv2.bias", out_dim)

    enc("fnet", 256, batch=False)
    enc("cnet", 256, batch=True)
    corr_planes = 4 * 81
    add("update_block.encoder.convc1.weight", 256, corr_planes, 1, 1)
    add("update_block.encoder.convc1.bias", 256)
    add("update_block.encoder.convc2.weight", 192, 256, 3, 3)
    add("update_block.encoder.convc2.bias", 192)
    add("update_block.encoder.convf1.weight", 128, 2, 7, 7)
    add("update_block.encoder.convf1.bias", 128)
    add("update_block.encoder.convf2.weight", 64, 128, 3, 3)
    add("update_block.encoder.convf2.bias", 64)
    add("update_block.encoder.conv.weight", 126, 256, 3, 3)
    add("update_block.encoder.conv.bias", 126)
    for s_, kern in (("1", (1, 5)), ("2", (5, 1))):
        for g in ("z", "r", "q"):
            add(f"update_block.gru.conv{g}{s_}.weight", 128, 384, *kern)
            add(f"update_block.gru.conv{g}{s_}.bias", 128)
    add("update_block.flow_head.conv1.weight", 256, 128, 3, 3)
    add("update_block.flow_head.conv1.bias", 256)
    add("update_block.flow_head.conv2.weight", 2, 256, 3, 3)
    add("update_block.flow_head.conv2.bias", 2)
    add("update_block.mask.0.weight", 256, 128, 3, 3)
    add("update_block.mask.0.bias", 256)
    add("update_block.mask.2.weight", 576, 256, 1, 1)
    add("update_block.mask.2.bias", 576)
    return sd


def test_raft_port_structure_and_forward():
    from pgdvs_tpu.models.flow.raft import RAFT, RAFTFlow
    from pgdvs_tpu.models.flow.raft_port import port_raft

    sd = _fake_raft_sd()
    params = {"params": jax.tree_util.tree_map(jnp.asarray, port_raft(sd))}

    # structure must match a fresh init exactly
    model = RAFT(iters=2)
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (40, 48, 3)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(img))
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, init)
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    rf, rd = jax.tree_util.tree_flatten(ref_shapes)
    gf, gd = jax.tree_util.tree_flatten(got_shapes)
    assert rd == gd, f"pytree mismatch\n{rd}\nvs\n{gd}"
    assert rf == gf

    flow = model.apply(params, jnp.asarray(img), jnp.asarray(img))
    assert flow.shape == (40, 48, 2)
    assert np.isfinite(np.asarray(flow)).all()

    # contract wrapper with odd sizes (padding path)
    wrapper = RAFTFlow(params=params, iters=2)
    a = jnp.asarray(rng.uniform(0, 1, (35, 45, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (35, 45, 3)).astype(np.float32))
    f12, f21 = wrapper(a, b)
    assert f12.shape == (35, 45, 2) and f21.shape == (35, 45, 2)
    assert np.isfinite(np.asarray(f12)).all()


def test_lookup_corr_full_window_vs_torch_corrblock():
    """Full-window tap enumeration vs the reference CorrBlock oracle.

    princeton-vl RAFT builds ``delta = stack(meshgrid(dy, dx), -1)`` and feeds
    channel 0 (dy — the SLOW window axis) to grid_sample's x coordinate; the
    released checkpoints' convc1 expects that transposed enumeration. The
    center-tap test above is transpose-invariant, so this oracle covers every
    tap at fractional coords, on two pyramid levels.
    """
    torch = pytest.importorskip("torch")
    from pgdvs_tpu.models.flow.raft import build_corr_pyramid, lookup_corr

    rng = np.random.default_rng(7)
    h8, w8, c = 8, 10, 16
    r = 2
    f1 = rng.normal(size=(h8, w8, c)).astype(np.float32)
    f2 = rng.normal(size=(h8, w8, c)).astype(np.float32)
    coords = (
        rng.uniform(0, [w8 - 1, h8 - 1], size=(h8, w8, 2)).astype(np.float32)
    )

    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=2)
    got = np.asarray(lookup_corr(pyr, jnp.asarray(coords), radius=r))

    # torch oracle: reference CorrBlock.__call__ + bilinear_sampler
    n = h8 * w8
    out_pyr = []
    for lvl in range(2):
        corr_t = torch.from_numpy(np.asarray(pyr[lvl]))[:, None]  # [N,1,h,w]
        hh, ww = corr_t.shape[-2:]
        rr = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(rr, rr, indexing="ij"), dim=-1)
        centroid = torch.from_numpy(coords.reshape(n, 1, 1, 2)) / (2.0 ** lvl)
        cl = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
        xg = 2 * cl[..., 0:1] / (ww - 1) - 1
        yg = 2 * cl[..., 1:2] / (hh - 1) - 1
        samp = torch.nn.functional.grid_sample(
            corr_t, torch.cat([xg, yg], dim=-1), align_corners=True
        )
        out_pyr.append(samp.reshape(n, -1))
    ref = torch.cat(out_pyr, dim=-1).numpy().reshape(h8, w8, -1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

"""CoTracker flax port: numeric parity vs the reference torch modules.

The reference vendors CoTracker (facebookresearch) under
``/root/reference/pgdvs/models/cotracker``; its blocks import two standard
timm classes (ViT Attention / Mlp) that are stubbed here with their public
definitions since timm is not installed. Random torch weights are ported
through ``cotracker_port`` and the flax model must reproduce the torch
outputs (encoder, updateformer, one full window, full sliding-window
forward).
"""

import sys
import importlib.machinery
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # CoTracker torch A/B + jit e2e

import jax
import jax.numpy as jnp

REF = "/root/reference"


def _stub_timm(torch):
    import torch.nn as tnn

    class Attention(tnn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False, **kw):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads) ** -0.5
            self.qkv = tnn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = tnn.Linear(dim, dim)

        def forward(self, x):
            B, N, C = x.shape
            qkv = (
                self.qkv(x)
                .reshape(B, N, 3, self.num_heads, C // self.num_heads)
                .permute(2, 0, 3, 1, 4)
            )
            q, k, v = qkv.unbind(0)
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class Mlp(tnn.Module):
        def __init__(
            self, in_features, hidden_features=None, out_features=None,
            act_layer=tnn.GELU, drop=0.0,
        ):
            super().__init__()
            out_features = out_features or in_features
            self.fc1 = tnn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = tnn.Linear(hidden_features, out_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    timm = types.ModuleType("timm")
    timm.__spec__ = importlib.machinery.ModuleSpec("timm", None)
    models = types.ModuleType("timm.models")
    models.__spec__ = importlib.machinery.ModuleSpec("timm.models", None)
    vt = types.ModuleType("timm.models.vision_transformer")
    vt.__spec__ = importlib.machinery.ModuleSpec("timm.models.vision_transformer", None)
    vt.Attention = Attention
    vt.Mlp = Mlp
    timm.models = models
    models.vision_transformer = vt
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", models)
    sys.modules["timm.models.vision_transformer"] = vt


def _import_reference():
    torch = pytest.importorskip("torch")
    _stub_timm(torch)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from pgdvs.models.cotracker.models.core.cotracker.cotracker import (
            CoTracker as TorchCoTracker,
        )
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference CoTracker unavailable: {e}")
    return torch, TorchCoTracker


def _make_torch(torch, TorchCoTracker):
    torch.manual_seed(0)
    model = TorchCoTracker(
        S=8, stride=4, add_space_attn=True, space_depth=6, time_depth=6
    )
    # with fully random weights the iterative update loop diverges to
    # inf/NaN (trained weights are contractive); damp the update head so
    # the full-forward A/B runs in a numerically sane regime
    with torch.no_grad():
        model.updateformer.flow_head.weight *= 1e-2
        model.updateformer.flow_head.bias *= 0.0
    model.eval()
    return model


def _to_np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def ported():
    torch, TorchCoTracker = _import_reference()
    tmodel = _make_torch(torch, TorchCoTracker)
    from pgdvs_tpu.models.tracking.cotracker import CoTrackerModel
    from pgdvs_tpu.models.tracking.cotracker_port import port_cotracker

    params = {"params": jax.tree_util.tree_map(
        jnp.asarray, port_cotracker(_to_np_sd(tmodel))
    )}
    fmodel = CoTrackerModel(S=8, stride=4)
    return torch, tmodel, fmodel, params


def test_encoder_parity(ported):
    torch, tmodel, fmodel, params = ported
    rng = np.random.default_rng(0)
    # H, W divisible by 8 (stride 4 encoder downsamples /8 internally)
    frames = rng.uniform(0, 255, (2, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel.fnet(
            torch.tensor(
                2 * (frames.transpose(0, 3, 1, 2) / 255.0) - 1.0,
                dtype=torch.float32,
            )
        ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(
        fmodel.apply(params, jnp.asarray(frames), method=fmodel.encode)
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_updateformer_parity(ported):
    torch, tmodel, fmodel, params = ported
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, 8, 456)).astype(np.float32)  # [N, T, C]
    with torch.no_grad():
        ref = tmodel.updateformer(torch.tensor(x)[None]).numpy()[0]

    from pgdvs_tpu.models.tracking.cotracker import UpdateFormerF

    got = np.asarray(
        UpdateFormerF().apply(
            {"params": params["params"]["updateformer"]}, jnp.asarray(x)
        )
    )
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_full_forward_parity(ported):
    """Full sliding-window tracking vs the reference forward (uniform query
    time — the pgdvs usage pattern; T > S exercises window carry-over)."""
    torch, tmodel, fmodel, params = ported
    rng = np.random.default_rng(2)
    t_n, h, w = 12, 64, 96
    frames = rng.uniform(0, 255, (t_n, h, w, 3)).astype(np.float32)
    n = 6
    queries = np.stack(
        [
            np.zeros(n),
            rng.uniform(4, w - 5, n),
            rng.uniform(4, h - 5, n),
        ],
        axis=-1,
    ).astype(np.float32)

    with torch.no_grad():
        traj_t, _, vis_t, _ = tmodel(
            rgbs=torch.tensor(frames.transpose(0, 3, 1, 2))[None] / 255.0 * 255.0,
            queries=torch.tensor(queries)[None],
            iters=4,
        )
    ref_traj = traj_t[0].numpy()  # [T, N, 2]
    ref_vis = vis_t[0].numpy()  # [T, N] (sigmoided)

    got_traj, got_vis_logit = fmodel.apply(
        params, jnp.asarray(frames), jnp.asarray(queries), iters=4
    )
    got_traj = np.asarray(got_traj)
    got_vis = np.asarray(jax.nn.sigmoid(got_vis_logit))

    # 4 refinement iterations feed bilinear-sampled correlation back into
    # the coords, so float-accumulation differences amplify; with random
    # (non-contractive) weights a ~0.3 px tail on single elements remains
    # while the distribution matches tightly
    np.testing.assert_allclose(got_traj, ref_traj, rtol=2e-2, atol=0.3)
    np.testing.assert_allclose(got_vis, ref_vis, rtol=2e-2, atol=0.1)
    assert float(np.median(np.abs(got_traj - ref_traj))) < 0.02


def test_tracker_contract_shapes(ported):
    """CoTrackerTracker satisfies the pgdvs_tpu tracker contract."""
    _, _, _, params = ported
    from pgdvs_tpu.models.tracking.cotracker import CoTrackerTracker

    tracker = CoTrackerTracker(params=params, interp_hw=(64, 96))
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.uniform(0, 1, (6, 24, 32, 3)).astype(np.float32))
    queries = jnp.asarray(
        np.stack(
            [np.full(5, 2.0), rng.uniform(2, 29, 5), rng.uniform(2, 21, 5)],
            axis=-1,
        ).astype(np.float32)
    )
    tracks, visibles = tracker(frames, queries)
    assert tracks.shape == (5, 6, 2)
    assert visibles.shape == (5, 6)
    assert visibles.dtype == jnp.bool_
    assert np.isfinite(np.asarray(tracks)).all()
    assert (np.asarray(tracks) >= 0).all()

"""TAPIR structural tests: forward shapes, query reproduction at init,
haiku-checkpoint remapping against an architecture-spec fake checkpoint."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # TAPIR structural e2e

from pgdvs_tpu.models.tracking.tapir import (
    INITIAL_RES,
    Tapir,
    TapirTracker,
    convert_grid_coords,
    init_tapir_params,
)
from pgdvs_tpu.models.tracking.tapir_port import remap_haiku_params


def test_convert_grid_coords_plain_scale():
    # plain coords * out/in — matching the reference transforms.py CODE
    # (its docstring claims half-pixel alignment, but the released
    # checkpoint was trained with the plain scale; see tapir.py note)
    out = np.asarray(convert_grid_coords(jnp.asarray([0.0]), (4,), (8,)))
    assert out[0] == pytest.approx(0.0)
    out = np.asarray(convert_grid_coords(jnp.asarray([3.0]), (4,), (8,)))
    assert out[0] == pytest.approx(6.0)


@pytest.fixture(scope="module")
def tiny_model():
    return init_tapir_params(jax.random.PRNGKey(0), n_frames=3, n_queries=4)


def test_tapir_tracker_contract(tiny_model):
    model, params = tiny_model
    tr = TapirTracker(params=params, model=model)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 1, (3, 48, 64, 3)).astype(np.float32))
    queries = jnp.asarray(
        [[0, 10.0, 12.0], [1, 40.0, 30.0], [2, 20.0, 20.0], [1, 5.0, 5.0]],
        jnp.float32,
    )
    valid = jnp.asarray([True, True, True, False])
    tracks, vis = tr(frames, queries, valid)
    assert tracks.shape == (4, 3, 2)
    assert vis.shape == (4, 3)
    assert np.isfinite(np.asarray(tracks)).all()
    assert not np.asarray(vis)[3].any()  # invalid query never visible


def test_cost_volume_init_reproduces_query_points(tiny_model):
    """The TAP-Net init must return the query position verbatim on the
    query's own frame (tapir_model.py:345-411 heatmaps_to_points)."""
    model, params = tiny_model
    rng = np.random.default_rng(1)
    video = jnp.asarray(
        rng.uniform(-1, 1, (3,) + INITIAL_RES + (3,)).astype(np.float32)
    )
    q = jnp.asarray([[0, 30.0, 40.0], [2, 100.0, 200.0]], jnp.float32)

    def init_only(m, video, q):
        grids = m.feature_grids(video)
        _q_hi, q_lo = m.query_features(grids, q, INITIAL_RES)
        return m.tracks_from_cost_volume(q_lo, grids[1], q, INITIAL_RES)

    pts, occ, expd = nn_apply(init_only, params, video, q)
    pts = np.asarray(pts)
    np.testing.assert_allclose(pts[0, 0], [40.0, 30.0], atol=1e-4)  # (x, y)
    np.testing.assert_allclose(pts[1, 2], [200.0, 100.0], atol=1e-4)
    assert occ.shape == (2, 3) and expd.shape == (2, 3)


def nn_apply(fn, params, *args):
    import flax.linen as nn

    return nn.apply(fn, Tapir())(params, *args)


def _fake_haiku_ckpt():
    """Architecture-spec haiku checkpoint with correct paths + shapes."""
    rng = np.random.default_rng(0)
    ckpt = {}

    def add(path, **kw):
        ckpt[path] = {k: rng.normal(size=s).astype(np.float32) for k, s in kw.items()}

    add("tapir/~/resnet/~/initial_conv", w=(7, 7, 3, 64))
    channels = [64, 128, 256, 256]
    in_ch = 64
    for g, ch in enumerate(channels):
        for b in range(2):
            base = f"tapir/~/resnet/~/block_group_{g}/~/block_{b}"
            cin = in_ch if b == 0 else ch
            add(f"{base}/~/instancenorm_0", scale=(cin,), offset=(cin,))
            add(f"{base}/~/conv_0", w=(3, 3, cin, ch))
            add(f"{base}/~/instancenorm_1", scale=(ch,), offset=(ch,))
            add(f"{base}/~/conv_1", w=(3, 3, ch, ch))
            if b == 0:
                add(f"{base}/~/shortcut_conv", w=(1, 1, cin, ch))
        in_ch = ch

    add("tapir/~/cost_volume_regression_1", w=(3, 3, 1, 16), b=(16,))
    add("tapir/~/cost_volume_regression_2", w=(3, 3, 16, 1), b=(1,))
    add("tapir/~/cost_volume_occlusion_1", w=(3, 3, 16, 32), b=(32,))
    add("tapir/~/cost_volume_occlusion_2", w=(32, 16), b=(16,))
    add("tapir/~/occlusion_out", w=(16, 2), b=(2,))

    cmix = 4 + 128 + 256  # mixer output channels
    cin_mix = 2 + 1 + 1 + 384 + 49 * 2
    hid = 512
    add("tapir/~/pips_mlp_mixer/linear", w=(cin_mix, hid), b=(hid,))
    for i in range(12):
        blk = "block" if i == 0 else f"block_{i}"
        base = f"tapir/~/pips_mlp_mixer/{blk}"
        add(f"{base}/layer_norm", scale=(hid,))
        add(f"{base}/mlp1_up", w=(3, hid, 4), b=(hid * 4,))
        add(f"{base}/mlp1_up_1", w=(3, hid * 4, 1), b=(hid * 4,))
        add(f"{base}/layer_norm_1", scale=(hid,))
        add(f"{base}/mlp2_up", w=(hid, hid * 4), b=(hid * 4,))
        add(f"{base}/mlp2_down", w=(hid * 4, hid), b=(hid,))
    add("tapir/~/pips_mlp_mixer/layer_norm", scale=(hid,))
    add("tapir/~/pips_mlp_mixer/linear_1", w=(hid, cmix), b=(cmix,))
    return ckpt


def test_haiku_remap_matches_flax_init_structure(tiny_model):
    model, init = tiny_model
    ported = {"params": remap_haiku_params(_fake_haiku_ckpt())}
    ref = jax.tree_util.tree_map(lambda x: x.shape, init)
    got = jax.tree_util.tree_map(lambda x: x.shape, ported)
    ref_flat, ref_def = jax.tree_util.tree_flatten(ref)
    got_flat, got_def = jax.tree_util.tree_flatten(got)
    assert ref_def == got_def, f"structure mismatch:\n{ref_def}\nvs\n{got_def}"
    assert ref_flat == got_flat

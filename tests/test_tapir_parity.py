"""TAPIR flax port vs the vendored haiku reference (numeric A/B).

The reference vendors deepmind's haiku TAPIR
(``/root/reference/pgdvs/models/tapnet/tapir_model.py``); dm-haiku is
installed, so random haiku-initialized parameters are remapped through
``tapir_port.remap_haiku_params`` and the flax model must reproduce the
haiku outputs — the numeric validation of the checkpoint remap that a
structure-only test cannot provide.

This A/B already caught a real bug: the reference's
``transforms.convert_grid_coordinates`` docstring describes half-pixel
alignment but the code is a plain scale; implementing the docstring shifted
all tracks by stride/2.

Comparison design: the deterministic stages (feature grids, query features,
occlusion/expected-dist heads) must match tightly. Track POSITIONS go
through a soft-argmax whose argmax cell is unstable when two heatmap peaks
tie (with random weights, most frames' heatmaps are near-noise), so tracks
are compared by median + quantile with an explicit outlier budget.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # two full TAPIR inits + applies (~minutes)

REF = "/root/reference"


@pytest.fixture(scope="module")
def oracle():
    if not hasattr(jax, "tree_map"):  # removed in new jax; vendored code uses it
        jax.tree_map = jax.tree_util.tree_map
    if REF not in sys.path:
        sys.path.insert(0, REF)
    hk = pytest.importorskip("haiku")
    try:
        from pgdvs.models.tapnet.tapir_model import TAPIR as HaikuTAPIR
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"vendored haiku TAPIR unavailable: {e}")

    def fwd(frames, queries):
        model = HaikuTAPIR(
            bilinear_interp_with_depthwise_conv=False, pyramid_level=0
        )
        return model(
            video=frames,
            query_points=queries,
            is_training=False,
            query_chunk_size=64,
        )

    f = hk.transform_with_state(fwd)
    rng = np.random.default_rng(0)
    # the haiku model's native resolution is 256x256 (it internally resizes
    # other sizes, the flax port requires 256 input); structured translating
    # texture so the cost volumes have genuine correlation peaks
    t_n, hw, n = 3, 256, 4
    base = rng.uniform(-1, 1, (hw, hw, 3)).astype(np.float32)
    frames = jnp.asarray(
        np.stack([np.roll(base, 6 * i, axis=1) for i in range(t_n)])[None]
    )
    queries = jnp.asarray(
        np.stack(
            [np.zeros(n), rng.uniform(32, hw - 32, n),
             rng.uniform(32, hw - 32, n)],
            axis=-1,
        ).astype(np.float32)
    )[None]
    params, state = f.init(jax.random.PRNGKey(0), frames, queries)
    out, _ = f.apply(params, state, jax.random.PRNGKey(1), frames, queries)

    from pgdvs_tpu.models.tracking.tapir_port import remap_haiku_params

    flat = {
        k: {p: np.asarray(v) for p, v in sub.items()}
        for k, sub in params.items()
    }
    fparams = {"params": jax.tree_util.tree_map(
        jnp.asarray, remap_haiku_params(flat)
    )}
    return fparams, frames, queries, out


def test_tapir_feature_and_query_stages(oracle):
    fparams, frames, queries, out = oracle
    from pgdvs_tpu.models.tracking.tapir import Tapir

    model = Tapir()
    hw = frames.shape[2]
    grids = model.apply(fparams, frames[0], method=model.feature_grids)
    # occlusion / expected-dist heads are deterministic mlps on the cost
    # volume: tight agreement required
    q_hi, q_lo = model.apply(
        fparams, grids, queries[0], (hw, hw), method=model.query_features
    )
    pts, occ, expd = model.apply(
        fparams, q_lo, grids[1], queries[0], (hw, hw),
        method=model.tracks_from_cost_volume,
    )
    ref_occ = np.asarray(out["unrefined_occlusion"][0])[0]
    ref_expd = np.asarray(out["unrefined_expected_dist"][0])[0]
    np.testing.assert_allclose(np.asarray(occ), ref_occ, rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(expd), ref_expd, rtol=1e-2, atol=1e-2
    )
    # init tracks: median must be sub-pixel; soft-argmax cell flips on tied
    # peaks are allowed for a minority of entries
    ref_pts = np.asarray(out["unrefined_tracks"][0])[0]
    d = np.abs(np.asarray(pts) - ref_pts)
    assert np.median(d) < 0.5, np.median(d)
    assert (d > 4.0).mean() < 0.25, (d > 4.0).mean()


def test_tapir_full_network_parity(oracle):
    fparams, frames, queries, out = oracle
    from pgdvs_tpu.models.tracking.tapir import Tapir

    model = Tapir()
    pts, occ, expd = model.apply(fparams, frames[0], queries[0])

    ref_tracks = np.asarray(out["tracks"])[0]
    ref_occ = np.asarray(out["occlusion"])[0]
    ref_expd = np.asarray(out["expected_dist"])[0]

    d = np.abs(np.asarray(pts) - ref_tracks)
    assert np.median(d) < 2.0, np.median(d)
    assert (d > 8.0).mean() < 0.25, (d > 8.0).mean()
    # occ / expd logits follow the track positions through refinement, so
    # compare them only where the two implementations landed on the same
    # track (entries that diverged via an argmax flip sample different
    # features and legitimately produce different logits)
    agree = d.max(axis=-1) < 2.0
    assert agree.mean() >= 0.4, agree.mean()
    # with random (untrained) weights the logit scale is arbitrary and the
    # refinement feeds fp drift back through bilinear corr sampling, so the
    # agreed-track logits still wander ~1; the tight deterministic-stage
    # checks above carry the parity weight
    occ_d = np.abs(np.asarray(occ) - ref_occ)[agree]
    expd_d = np.abs(np.asarray(expd) - ref_expd)[agree]
    assert np.median(occ_d) < 1.5, np.median(occ_d)
    assert np.median(expd_d) < 1.5, np.median(expd_d)

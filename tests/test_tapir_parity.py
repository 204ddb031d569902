"""TAPIR flax port vs the vendored haiku reference (numeric A/B).

The reference vendors deepmind's haiku TAPIR
(``/root/reference/pgdvs/models/tapnet/tapir_model.py``); dm-haiku is
installed, so random haiku-initialized parameters are remapped through
``tapir_port.remap_haiku_params`` and the flax model must reproduce the
haiku outputs — the numeric validation of the checkpoint remap that a
structure-only test cannot provide.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # two full TAPIR inits + applies (~minutes)

REF = "/root/reference"


@pytest.fixture(scope="module")
def haiku_oracle():
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
    t_n, hw, n = 4, 64, 5
    frames = jnp.asarray(
        rng.uniform(-1, 1, (1, t_n, hw, hw, 3)).astype(np.float32)
    )
    queries = jnp.asarray(
        np.stack(
            [np.zeros(n), rng.uniform(8, hw - 8, n), rng.uniform(8, hw - 8, n)],
            axis=-1,
        ).astype(np.float32)
    )[None]
    params, state = f.init(jax.random.PRNGKey(0), frames, queries)
    out, _ = f.apply(params, state, jax.random.PRNGKey(1), frames, queries)
    return params, frames, queries, out


def test_tapir_full_network_parity(haiku_oracle):
    params, frames, queries, ref = haiku_oracle
    from pgdvs_tpu.models.tracking.tapir import Tapir
    from pgdvs_tpu.models.tracking.tapir_port import remap_haiku_params

    flat = {
        k: {p: np.asarray(v) for p, v in sub.items()}
        for k, sub in params.items()
    }
    fparams = {"params": jax.tree_util.tree_map(
        jnp.asarray, remap_haiku_params(flat)
    )}
    model = Tapir()
    pts, occ, expd = model.apply(
        fparams, frames[0], queries[0], method=model.__call__
    )

    ref_tracks = np.asarray(ref["tracks"])[0]  # [N, T, 2]
    ref_occ = np.asarray(ref["occlusion"])[0]
    ref_expd = np.asarray(ref["expected_dist"])[0]

    got_tracks = np.asarray(pts)
    np.testing.assert_allclose(got_tracks, ref_tracks, rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(np.asarray(occ), ref_occ, rtol=1e-3, atol=0.02)
    np.testing.assert_allclose(
        np.asarray(expd), ref_expd, rtol=1e-3, atol=0.02
    )

"""ZoeDepth metric-bins head: unit tests of the adaptive-bin math
(Bhat et al. 2302.12288 — seed bins, inverse attractors, log-binomial)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgdvs_tpu.models.depth.zoe_head import (
    AttractorLayer,
    LogBinomial,
    MetricBinsHead,
    SeedBinRegressor,
    ZoeDepthModel,
    inverse_attractor,
)


def test_seed_bins_sorted_and_in_range():
    mod = SeedBinRegressor(n_bins=16, min_depth=0.5, max_depth=8.0)
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(4, 5, 32)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), feat)
    centers = np.asarray(mod.apply(params, feat))
    assert centers.shape == (4, 5, 16)
    assert (np.diff(centers, axis=-1) > 0).all()  # strictly increasing
    assert centers.min() >= 0.5 and centers.max() <= 8.0


def test_inverse_attractor_properties():
    # bounded pull, sign-preserving, vanishing at zero distance
    d = jnp.asarray([-2.0, -0.1, 0.0, 0.1, 2.0])
    dc = np.asarray(inverse_attractor(d, alpha=300.0, gamma=2))
    assert dc[2] == 0.0
    assert (np.sign(dc) == np.sign(np.asarray(d))).all()
    assert np.abs(dc).max() <= 1.0 / (2.0 * np.sqrt(300.0)) + 1e-6  # max of
    # x/(1+a x^2) is 1/(2 sqrt(a))


def test_attractor_layer_moves_centers_toward_attractors():
    mod = AttractorLayer(n_attractors=4, min_depth=0.1, max_depth=10.0)
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.normal(size=(3, 3, 16)).astype(np.float32))
    centers = jnp.broadcast_to(
        jnp.linspace(0.5, 9.5, 8), (3, 3, 8)
    ).astype(jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), feat, centers)
    out = np.asarray(mod.apply(params, feat, centers))
    assert out.shape == (3, 3, 8)
    assert out.min() >= 0.1 and out.max() <= 10.0
    # the inverse attractor's bounded step keeps adjustments small
    assert np.abs(out - np.asarray(centers)).max() < 0.5


def test_log_binomial_normalized_and_unimodal():
    mod = LogBinomial(n_bins=32)
    rng = np.random.default_rng(2)
    feat = jnp.asarray(rng.normal(size=(6, 24)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), feat)
    probs = np.asarray(mod.apply(params, feat))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    assert (probs >= 0).all()
    # unimodal over bin index: signs of the discrete derivative flip once
    for row in probs:
        d = np.diff(row)
        sign_changes = np.sum(np.abs(np.diff(np.sign(d[np.abs(d) > 1e-12]))))
        assert sign_changes <= 2


def test_metric_bins_head_and_model_range():
    model = ZoeDepthModel(n_bins=16, min_depth=0.3, max_depth=6.0)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (32, 40, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), img)
    depth = np.asarray(jax.jit(model.apply)(params, img))
    assert depth.shape == (32, 40)
    assert np.isfinite(depth).all()
    assert depth.min() >= 0.3 - 1e-4 and depth.max() <= 6.0 + 1e-4

"""ZoeDepth metric-bins head (flax) — adaptive bins over a relative-depth
backbone.

The reference's depth preprocessing runs the external ZoeDepth N/K/NK
models (``/root/reference/pgdvs/preprocess/compute_zoedepth.py:146-166``;
the code lives in third_parties, not vendored). This module implements the
ZoeDepth computation structure (Bhat et al., arXiv 2302.12288) TPU-first:

  * seed bin regressor: N positive bin widths (softplus) over
    [min_depth, max_depth] -> ordered bin centers per pixel;
  * attractor layers: at each decoder scale, predicted attractor points
    pull the bin centers via the inverse attractor
    ``dc = mean_k (a_k - c) / (1 + alpha * |a_k - c|^gamma)``;
  * conditional log-binomial probabilities over the bins (mode p and
    temperature t predicted per pixel);
  * metric depth = sum_i prob_i * center_i.

The relative-depth backbone is pluggable (`ZoeDepthModel` takes any module
returning (rel_depth, multi-scale features)); the reference's MiDaS
DPT-BEiT backbone needs its released checkpoint + timm-layout port, which
this environment cannot validate — the head math here is exact and fully
unit-tested, and `SmallDepthBackbone` provides a self-contained conv
backbone for structural use.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class SeedBinRegressor(nn.Module):
    """Per-pixel seed bin centers from bottleneck features.

    n_bins positive widths (softplus + eps), normalized to span
    [min_depth, max_depth]; centers at cumulative midpoints.
    """

    n_bins: int = 64
    min_depth: float = 1e-3
    max_depth: float = 10.0
    hidden: int = 128

    @nn.compact
    def __call__(self, feat):
        # feat: [..., C] -> centers [..., n_bins] (sorted ascending)
        x = nn.relu(nn.Dense(self.hidden, name="fc1")(feat))
        w = nn.softplus(nn.Dense(self.n_bins, name="fc2")(x)) + 1e-3
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        w = w * (self.max_depth - self.min_depth)
        edges = self.min_depth + jnp.cumsum(w, axis=-1)
        centers = edges - 0.5 * w
        return centers


def inverse_attractor(delta, alpha: float = 300.0, gamma: int = 2):
    """dc = delta / (1 + alpha * |delta|^gamma) — the 'inv' attractor."""
    return delta / (1.0 + alpha * jnp.abs(delta) ** gamma)


class AttractorLayer(nn.Module):
    """Adjust bin centers toward n_attractors predicted depth points.

    Centers stay inside [min_depth, max_depth] (clipped) and keep their
    ordering in practice because the inverse attractor is bounded by
    1/(alpha^(1/gamma)) per attractor.
    """

    n_attractors: int = 16
    min_depth: float = 1e-3
    max_depth: float = 10.0
    alpha: float = 300.0
    gamma: int = 2
    hidden: int = 128

    @nn.compact
    def __call__(self, feat, centers):
        # feat: [..., C]; centers: [..., n_bins]
        x = nn.relu(nn.Dense(self.hidden, name="fc1")(feat))
        a = nn.softplus(nn.Dense(self.n_attractors, name="fc2")(x)) + 1e-3
        a = self.min_depth + (self.max_depth - self.min_depth) * (
            a / (1.0 + a)
        )  # attractor points inside the depth range
        delta = a[..., None, :] - centers[..., :, None]  # [..., bins, attr]
        dc = jnp.mean(
            inverse_attractor(delta, self.alpha, self.gamma), axis=-1
        )
        return jnp.clip(centers + dc, self.min_depth, self.max_depth)


class LogBinomial(nn.Module):
    """Conditional log-binomial probabilities over the n_bins indices.

    Per pixel, a mode q in (0, 1) and temperature t > 0 are predicted; the
    probability of bin k follows the binomial pmf in log space:
      log p_k = (k log q + (N-1-k) log(1-q) + log C(N-1, k)) / t
    softmax-normalized over k — unimodal over bin index with controllable
    sharpness (ZoeDepth's conditional log-binomial distribution).
    """

    n_bins: int = 64
    hidden: int = 128

    @nn.compact
    def __call__(self, feat):
        x = nn.relu(nn.Dense(self.hidden, name="fc1")(feat))
        qt = nn.Dense(2, name="fc2")(x)
        q = jax.nn.sigmoid(qt[..., 0:1]) * 0.998 + 1e-3  # (0, 1)
        t = nn.softplus(qt[..., 1:2]) + 0.1

        n = self.n_bins
        k = jnp.arange(n, dtype=jnp.float32)
        log_comb = (
            jax.scipy.special.gammaln(jnp.asarray(float(n)))
            - jax.scipy.special.gammaln(k + 1.0)
            - jax.scipy.special.gammaln(float(n) - k)
        )
        logits = (
            log_comb
            + k * jnp.log(q)
            + (float(n) - 1.0 - k) * jnp.log1p(-q)
        ) / t
        return jax.nn.softmax(logits, axis=-1)


class MetricBinsHead(nn.Module):
    """Seed bins + per-scale attractors + log-binomial expectation."""

    n_bins: int = 64
    n_attractors: Sequence[int] = (16, 8, 4, 1)
    min_depth: float = 1e-3
    max_depth: float = 10.0

    @nn.compact
    def __call__(self, bottleneck, scale_feats):
        """bottleneck: [H, W, C]; scale_feats: list of [Hi, Wi, Ci] decoder
        features (coarse -> fine). Returns metric depth [Hf, Wf, 1] at the
        finest feature resolution plus the final bin centers."""
        centers = SeedBinRegressor(
            self.n_bins, self.min_depth, self.max_depth, name="seed"
        )(bottleneck)

        for i, feat in enumerate(scale_feats):
            h, w = feat.shape[0], feat.shape[1]
            # resize running centers to this scale
            centers = jax.image.resize(
                centers, (h, w, self.n_bins), "bilinear"
            )
            centers = AttractorLayer(
                self.n_attractors[min(i, len(self.n_attractors) - 1)],
                self.min_depth,
                self.max_depth,
                name=f"attractor_{i}",
            )(feat, centers)

        probs = LogBinomial(self.n_bins, name="logbinomial")(scale_feats[-1])
        depth = jnp.sum(probs * centers, axis=-1, keepdims=True)
        return depth, centers


class SmallDepthBackbone(nn.Module):
    """Self-contained conv encoder/decoder producing (rel_depth,
    bottleneck, multi-scale features) — the pluggable-backbone contract the
    MiDaS DPT port will satisfy once its checkpoint can be provisioned."""

    width: int = 32

    @nn.compact
    def __call__(self, img):
        # img: [H, W, 3] in [0, 1]; H, W divisible by 8
        x = img[None]
        feats = []
        c = self.width
        for i in range(3):
            x = nn.relu(
                nn.Conv(c * (2 ** i), (3, 3), strides=(2, 2),
                        name=f"enc{i}")(x)
            )
            feats.append(x)
        bottleneck = x[0]
        dec = []
        for i, f in enumerate(reversed(feats)):
            x = jax.image.resize(x, f.shape, "bilinear")
            x = nn.relu(nn.Conv(f.shape[-1], (3, 3), name=f"dec{i}")(x + f))
            dec.append(x[0])
        rel = nn.softplus(nn.Conv(1, (3, 3), name="rel_out")(x))[0]
        return rel, bottleneck, dec


class ZoeDepthModel(nn.Module):
    """Backbone + metric-bins head -> metric depth at input resolution."""

    n_bins: int = 64
    min_depth: float = 1e-3
    max_depth: float = 10.0

    @nn.compact
    def __call__(self, img):
        rel, bottleneck, feats = SmallDepthBackbone(name="backbone")(img)
        depth, _centers = MetricBinsHead(
            self.n_bins, min_depth=self.min_depth, max_depth=self.max_depth,
            name="head",
        )(bottleneck, feats)
        h, w = img.shape[0], img.shape[1]
        return jax.image.resize(depth, (h, w, 1), "bilinear")[..., 0]

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
returning (rel_depth, multi-scale features)). The reference's MiDaS
DPT-BEiT backbone IS implemented and validated here: the full checkpoint
chain — BEiT rel-pos attention, layer-scale, DPT reassemble/fusion, relative
head, this metric-bins head — matches the HF ``transformers`` ZoeDepth torch
port at 2.5e-7 max relative error, with weights routed through the ORIGINAL
ZoeD_M12 key layout (``tests/test_dpt_backbone_ab.py``,
``models/depth/dpt_beit.py``, ``zoe_port.py``). Only the released checkpoint
*values* are unprovisionable in this zero-egress environment.
`SmallDepthBackbone` provides a self-contained conv backbone for
checkpoint-free structural tests.
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


# ---------------------------------------------------------------------------
# Published-checkpoint-faithful ZoeDepth heads (isl-org ZoeD_M12_* layout).
#
# The modules above are the structural re-implementation used by
# `ZoeDepthModel`; the classes below replicate the RELEASED checkpoints'
# exact architecture and quirks so `zoe_port.port_zoe_head_*` can load
# `ZoeD_M12_{N,K,NK}.pt` head weights faithfully. Math is A/B-validated
# against the HF `transformers` ZoeDepth port (itself output-parity-verified
# against the original) in tests/test_zoe_head_ab.py. Reference consumer:
# `/root/reference/pgdvs/preprocess/compute_zoedepth.py:146-166`.
#
# Replicated quirks (deliberate, checkpoint-compatibility-critical):
#   * the inverse attractor is evaluated with its DEFAULT alpha=300/gamma=2,
#     ignoring the config's attractor_alpha=1000 (the original forward never
#     passes them through);
#   * all interpolations are bilinear align_corners=True;
#   * the log-binomial uses the Stirling log-choose approximation with
#     eps=1e-7 and p clamped to [1e-4, 1].
# ---------------------------------------------------------------------------


def _interp_ac(x, h, w):
    """torch F.interpolate(mode='bilinear', align_corners=True) on [H, W, C]."""
    from pgdvs_tpu.models.depth.dpt_beit import _resize_bilinear_ac

    if x.shape[0] == h and x.shape[1] == w:
        return x
    return _resize_bilinear_ac(x, h, w)


class ZoeSeedBinRegressor(nn.Module):
    """`SeedBinRegressor[Unnormed]`: conv1x1 -> ReLU -> conv1x1 (+ act).

    normed=False ("softplus" bin_centers_type — all released ZoeD_M12
    checkpoints): centers = softplus activations directly (unbounded).
    normed=True: ReLU widths normalized to span [min_depth, max_depth].
    Returns (bins_for_attractors, bin_centers).
    """

    n_bins: int
    mlp_dim: int = 256
    min_depth: float = 1e-3
    max_depth: float = 10.0
    normed: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Conv(self.mlp_dim, (1, 1), name="conv1")(x))
        y = nn.Conv(self.n_bins, (1, 1), name="conv2")(y)
        if not self.normed:
            c = nn.softplus(y)
            return c, c
        w = nn.relu(y) + 1e-3
        w_normed = w / jnp.sum(w, axis=-1, keepdims=True)
        widths = (self.max_depth - self.min_depth) * w_normed
        widths = jnp.concatenate(
            [jnp.full(widths.shape[:-1] + (1,), self.min_depth, widths.dtype),
             widths], axis=-1,
        )
        edges = jnp.cumsum(widths, axis=-1)
        centers = 0.5 * (edges[..., :-1] + edges[..., 1:])
        return w_normed, centers


class ZoeProjector(nn.Module):
    """`Projector`: conv1x1 -> ReLU -> conv1x1 (no final activation)."""

    out_features: int
    mlp_dim: int = 128

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Conv(self.mlp_dim, (1, 1), name="conv1")(x))
        return nn.Conv(self.out_features, (1, 1), name="conv2")(y)


class ZoeAttractor(nn.Module):
    """`AttractorLayer[Unnormed]` with the original's effective behavior.

    The MLP consumes the bin embedding plus the (align-corners-resized)
    previous embedding; the inverse attractor runs with its default
    alpha=300/gamma=2. normed=True additionally predicts linear-norm pairs
    but uses only channel 0 (the original repo's preserved bug), rescales
    to [min_depth, max_depth], sorts and clips.
    """

    n_attractors: int
    min_depth: float = 1e-3
    max_depth: float = 10.0
    kind: str = "mean"
    mlp_dim: int = 128
    normed: bool = False

    @nn.compact
    def __call__(self, x, prev_bin, prev_bin_embedding=None):
        h, w = x.shape[0], x.shape[1]
        if prev_bin_embedding is not None:
            x = x + _interp_ac(prev_bin_embedding, h, w)
        y = nn.relu(nn.Conv(self.mlp_dim, (1, 1), name="conv1")(x))
        n_out = self.n_attractors * (2 if self.normed else 1)
        y = nn.Conv(n_out, (1, 1), name="conv2")(y)
        if self.normed:
            a = nn.relu(y) + 1e-3
            a = a.reshape(h, w, self.n_attractors, 2)[..., 0]
        else:
            a = nn.softplus(y)

        centers = _interp_ac(prev_bin, h, w)
        delta = inverse_attractor(a[..., None, :] - centers[..., :, None])
        red = jnp.mean if self.kind == "mean" else jnp.sum
        new_centers = centers + red(delta, axis=-1)
        if self.normed:
            scaled = (self.max_depth - self.min_depth) * new_centers + self.min_depth
            scaled = jnp.clip(jnp.sort(scaled, axis=-1),
                              self.min_depth, self.max_depth)
            return new_centers, scaled
        return new_centers, new_centers


class ZoeConditionalLogBinomial(nn.Module):
    """`ConditionalLogBinomial`: conv1x1 -> GELU -> conv1x1 -> softplus
    predicting two linear-norm pairs (probability, temperature), then the
    log-binomial softmax over bins."""

    n_classes: int
    bottleneck: int
    min_temp: float = 0.0212
    max_temp: float = 50.0

    @nn.compact
    def __call__(self, main, cond):
        x = jnp.concatenate([main, cond], axis=-1)
        y = nn.Conv(self.bottleneck, (1, 1), name="mlp0")(x)
        y = nn.gelu(y, approximate=False)
        pt = nn.softplus(nn.Conv(4, (1, 1), name="mlp2")(y))

        eps = 1e-4
        p = pt[..., 0:2] + eps
        p = p[..., 0] / (p[..., 0] + p[..., 1])
        t = pt[..., 2:4] + eps
        t = t[..., 0] / (t[..., 0] + t[..., 1])
        t = (self.max_temp - self.min_temp) * t + self.min_temp

        # log-binomial over bin indices (Stirling log-choose, eps=1e-7)
        n = float(self.n_classes)
        k = jnp.arange(self.n_classes, dtype=jnp.float32)
        beps = 1e-7
        nn_, kk = (n - 1.0) + beps, k + beps
        log_comb = (
            nn_ * jnp.log(nn_)
            - kk * jnp.log(kk)
            - (nn_ - kk) * jnp.log(nn_ - kk + beps)
        )
        pc = jnp.clip(p, eps, 1.0)[..., None]
        omp = jnp.clip(1.0 - p, eps, 1.0)[..., None]
        y = log_comb + k * jnp.log(pc) + ((n - 1.0) - k) * jnp.log(omp)
        return jax.nn.softmax(y / t[..., None], axis=-1)


class ZoeMetricHeadSingle(nn.Module):
    """`zoedepth.py` single metric head (ZoeD_M12_N / _K).

    Consumes (outconv_activation [H,W,32], bottleneck, features r4..r1
    coarse->fine, rel_depth [h,w]) and returns metric depth [H, W, 1].
    """

    n_bins: int = 64
    min_depth: float = 1e-3
    max_depth: float = 10.0
    bin_embedding_dim: int = 128
    n_attractors: Sequence[int] = (16, 8, 4, 1)
    seed_mlp_dim: int = 256
    num_relative_features: int = 32
    min_temp: float = 0.0212
    max_temp: float = 50.0
    normed: bool = False
    attractor_kind: str = "mean"

    @nn.compact
    def __call__(self, outconv_activation, bottleneck, features, rel_depth):
        btl = bottleneck.shape[-1]
        x = nn.Conv(btl, (1, 1), name="conv2")(bottleneck)
        _, seed_centers = ZoeSeedBinRegressor(
            self.n_bins, mlp_dim=self.seed_mlp_dim,
            min_depth=self.min_depth, max_depth=self.max_depth,
            normed=self.normed, name="seed_bin_regressor",
        )(x)
        prev_bin = (
            (seed_centers - self.min_depth) / (self.max_depth - self.min_depth)
            if self.normed else seed_centers
        )
        prev_emb = ZoeProjector(
            self.bin_embedding_dim, name="seed_projector"
        )(x)
        for i, feat in enumerate(features):
            emb = ZoeProjector(
                self.bin_embedding_dim, name=f"projector_{i}"
            )(feat)
            prev_bin, centers = ZoeAttractor(
                self.n_attractors[i], self.min_depth, self.max_depth,
                kind=self.attractor_kind, mlp_dim=self.bin_embedding_dim,
                normed=self.normed, name=f"attractor_{i}",
            )(emb, prev_bin, prev_emb)
            prev_emb = emb

        h, w = outconv_activation.shape[0], outconv_activation.shape[1]
        rel = _interp_ac(rel_depth[..., None], h, w)
        last = jnp.concatenate([outconv_activation, rel], axis=-1)
        emb_r = _interp_ac(prev_emb, h, w)
        probs = ZoeConditionalLogBinomial(
            self.n_bins,
            bottleneck=(self.num_relative_features + 1
                        + self.bin_embedding_dim) // 2,
            min_temp=self.min_temp, max_temp=self.max_temp,
            name="conditional_log_binomial",
        )(last, emb_r)
        centers_r = _interp_ac(centers, h, w)
        return jnp.sum(probs * centers_r, axis=-1, keepdims=True)


class ZoeTransformerEncoderLayer(nn.Module):
    """torch ``nn.TransformerEncoderLayer`` (post-norm, ReLU, batch of
    tokens [S, E]); attention uses the original packed in_proj layout."""

    hidden: int = 128
    heads: int = 4
    intermediate: int = 1024

    @nn.compact
    def __call__(self, tokens):
        s, e = tokens.shape
        in_proj_k = self.param(
            "in_proj_kernel", nn.initializers.lecun_normal(), (e, 3 * e)
        )
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        qkv = tokens @ in_proj_k + in_proj_b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = e // self.heads

        def heads_split(x):
            return x.reshape(s, self.heads, hd).transpose(1, 0, 2)

        qh, kh, vh = heads_split(q), heads_split(k), heads_split(v)
        att = jax.nn.softmax(
            (qh @ kh.transpose(0, 2, 1)) / jnp.sqrt(float(hd)), axis=-1
        )
        ctx = (att @ vh).transpose(1, 0, 2).reshape(s, e)
        ctx = nn.Dense(e, name="out_proj")(ctx)
        x = nn.LayerNorm(name="norm1")(tokens + ctx)
        y = nn.Dense(self.intermediate, name="linear1")(x)
        y = nn.Dense(e, name="linear2")(nn.relu(y))
        return nn.LayerNorm(name="norm2")(x + y)


class ZoePatchTransformer(nn.Module):
    """`PatchTransformerEncoder(use_class_token=True)`: conv1x1 token embed,
    a ZERO class token padded at position 0, concatenated sin|cos 1-d
    positional encoding, 4 post-norm encoder layers."""

    hidden: int = 128
    heads: int = 4
    intermediate: int = 1024
    layers: int = 4

    @nn.compact
    def __call__(self, x):
        emb = nn.Conv(self.hidden, (1, 1), name="embedding_convPxP")(x)
        tokens = emb.reshape(-1, self.hidden)
        tokens = jnp.concatenate(
            [jnp.zeros((1, self.hidden), tokens.dtype), tokens], axis=0
        )
        s, e = tokens.shape
        pos = jnp.arange(s, dtype=jnp.float32)[:, None]
        idx = jnp.arange(0, e, 2, dtype=jnp.float32)[None, :]
        div = jnp.exp(idx * (-jnp.log(10000.0) / e))
        pe = pos * div
        tokens = tokens + jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], axis=1)
        for i in range(self.layers):
            tokens = ZoeTransformerEncoderLayer(
                self.hidden, self.heads, self.intermediate, name=f"layer_{i}"
            )(tokens)
        return tokens


class ZoeMetricHeadMulti(nn.Module):
    """`zoedepth_nk.py` two-domain metric head (ZoeD_M12_NK).

    A patch transformer's class token routes between per-domain
    (seed regressor, attractors, conditional log-binomial) stacks with
    shared seed/scale projectors. Routing is data-dependent in torch; here
    both domains' (cheap, conv1x1) branches are computed and the argmax
    domain's output selected, keeping shapes static under jit. The NK head
    does NOT concatenate relative depth (last_in = 32) and uses
    mlp_dim = bin_embedding_dim // 2 and CLB bottleneck_factor 4.

    Returns (depth [H, W, 1], domain_logits [2]).
    """

    bin_confs: Sequence[dict] = (
        {"name": "nyu", "n_bins": 64, "min_depth": 1e-3, "max_depth": 10.0},
        {"name": "kitti", "n_bins": 64, "min_depth": 1e-3, "max_depth": 80.0},
    )
    bin_embedding_dim: int = 128
    n_attractors: Sequence[int] = (16, 8, 4, 1)
    num_relative_features: int = 32
    min_temp: float = 0.0212
    max_temp: float = 50.0
    normed: bool = False
    attractor_kind: str = "mean"
    patch_transformer_hidden: int = 128
    patch_transformer_intermediate: int = 1024

    @nn.compact
    def __call__(self, outconv_activation, bottleneck, features, rel_depth):
        btl = bottleneck.shape[-1]
        x = nn.Conv(btl, (1, 1), name="conv2")(bottleneck)

        cls = ZoePatchTransformer(
            self.patch_transformer_hidden,
            intermediate=self.patch_transformer_intermediate,
            name="patch_transformer",
        )(x)[0]
        y = nn.relu(nn.Dense(
            self.patch_transformer_hidden, name="mlp_classifier_0")(cls))
        domain_logits = nn.Dense(2, name="mlp_classifier_2")(y)

        emb_dim = self.bin_embedding_dim
        prev_emb0 = ZoeProjector(
            emb_dim, mlp_dim=emb_dim // 2, name="seed_projector"
        )(x)
        embs = [
            ZoeProjector(emb_dim, mlp_dim=emb_dim // 2, name=f"projector_{i}")(f)
            for i, f in enumerate(features)
        ]

        h, w = outconv_activation.shape[0], outconv_activation.shape[1]
        depths = []
        for conf in self.bin_confs:
            name, nb = conf["name"], conf["n_bins"]
            mind, maxd = conf["min_depth"], conf["max_depth"]
            _, seed_centers = ZoeSeedBinRegressor(
                nb, mlp_dim=emb_dim // 2, min_depth=mind, max_depth=maxd,
                normed=self.normed, name=f"seed_bin_regressor_{name}",
            )(x)
            prev_bin = (
                (seed_centers - mind) / (maxd - mind)
                if self.normed else seed_centers
            )
            prev_emb = prev_emb0
            for i, emb in enumerate(embs):
                # original zoedepth_nk.py passes n_attractors[i] into the
                # attractor's *n_bins* positional slot, so every layer keeps
                # the default 16 attractor points — released NK checkpoints
                # were trained with (and HF preserves) this bug
                prev_bin, centers = ZoeAttractor(
                    16, mind, maxd,
                    kind=self.attractor_kind, mlp_dim=emb_dim,
                    normed=self.normed, name=f"attractor_{name}_{i}",
                )(emb, prev_bin, prev_emb)
                prev_emb = emb
            emb_r = _interp_ac(prev_emb, h, w)
            probs = ZoeConditionalLogBinomial(
                nb,
                bottleneck=(self.num_relative_features + emb_dim) // 4,
                min_temp=self.min_temp, max_temp=self.max_temp,
                name=f"conditional_log_binomial_{name}",
            )(outconv_activation, emb_r)
            centers_r = _interp_ac(centers, h, w)
            depths.append(jnp.sum(probs * centers_r, axis=-1, keepdims=True))

        pick = jnp.argmax(domain_logits)
        depth = jnp.where(pick == 0, depths[0], depths[1])
        return depth, domain_logits

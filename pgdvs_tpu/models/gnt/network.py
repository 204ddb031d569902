"""GNT — generalizable NeRF transformer (flax).

Architecturally matches the reference network
(``/root/reference/pgdvs/models/gnt/models/transformer_network.py:341-539``)
so ``model_720000.pth`` weights port 1:1, but re-designed for XLA:

  * the reference's ``Attention2D`` computes valid-view std statistics by a
    *python loop over unique invalid counts* with dynamic-shape regrouping
    (``transformer_network.py:87-150``) — a per-chunk recompile hazard and
    the reference's own hot-loop wart. Here the identical statistics are
    computed with masked ``where`` reductions in fixed shapes.
  * masked view-attention softmax uses the "all views invalid -> attend to
    all views un-masked" fallback the reference's mask-rewrite produces.
  * everything is batched [..., S, V, C] and jit/vmap-friendly; no host
    sync, no dynamic shapes.

Structure (netwidth=64, depth=8): alternating *view transformer*
(subtraction attention over source views, ray-difference positional code)
and *ray transformer* (4-head QK attention over samples); q_fc MLP injects
sinusoidal position/view encodings every other block; final LayerNorm ->
mean over samples -> rgb head; the returned per-sample weights are the last
ray transformer's head-averaged first-query attention row
(``transformer_network.py:336``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

TINY = 1e-6


def sinusoidal_embed(x, n_freqs: int = 10, max_freq_log2: float = 9.0):
    """[x, sin(2^k x), cos(2^k x) ...] positional encoding.

    Matches the reference Embedder (include_input, log-sampled bands,
    per-frequency sin-then-cos channel order —
    ``transformer_network.py:10-41``).

    When the bands are the default octave ladder (2^0 .. 2^{n-1}) the
    sin/cos stack is computed by the double-angle recurrence
    ``s' = 2sc, c' = c^2 - s^2`` from ONE transcendental pair instead of
    2*n_freqs transcendental passes — this embed runs per ray tile at
    benchmark scale and the sine passes alone were ~100 ms/tile of VPU
    time (XLA cost model, scripts/hlo_dump_exp.py). Max deviation from
    the direct per-band f32 sine is ~5e-5 at band 2^9 (measured), well
    below the transformer's bf16 activation precision.
    """
    octave_ladder = (
        n_freqs >= 2 and float(max_freq_log2) == float(n_freqs - 1)
    )
    parts = [x]
    if octave_ladder:
        s, c = jnp.sin(x), jnp.cos(x)
        for _ in range(n_freqs):
            parts.append(s)
            parts.append(c)
            s, c = 2.0 * s * c, c * c - s * s
    else:
        freqs = 2.0 ** jnp.linspace(0.0, max_freq_log2, n_freqs)
        for f in freqs:
            parts.append(jnp.sin(x * f))
            parts.append(jnp.cos(x * f))
    return jnp.concatenate(parts, axis=-1)


def masked_view_std(k, valid, eps: float = TINY):
    """Per-(ray, sample) std of k over *valid* views + normalized variant.

    Fixed-shape equivalent of the reference's unique-invalid-count regrouping
    (``transformer_network.py:87-150``): unbiased std over valid views;
    exactly one valid view -> zeros; zero valid views -> std over all views
    (the reference unmasks those rows).

    Args:
      k: [..., V, C]; valid: [..., V, 1] (1 = valid).
    Returns: (std [..., C], normalized_std [..., C]).
    """
    v = k.shape[-2]
    cnt = jnp.sum(valid, axis=-2)  # [..., 1]
    all_invalid = cnt == 0
    eff_valid = jnp.where(all_invalid[..., None, :], jnp.ones_like(valid), valid)
    eff_cnt = jnp.where(all_invalid, float(v), cnt)  # [..., 1]

    mean = jnp.sum(k * eff_valid, axis=-2) / eff_cnt
    var = jnp.sum((k - mean[..., None, :]) ** 2 * eff_valid, axis=-2) / jnp.maximum(
        eff_cnt - 1.0, 1.0
    )
    std = jnp.sqrt(var)
    mean_abs = jnp.sum(jnp.abs(k) * eff_valid, axis=-2) / eff_cnt
    norm_std = std / (mean_abs + eps)
    single = eff_cnt == 1
    std = jnp.where(single, 0.0, std)
    norm_std = jnp.where(single, 0.0, norm_std)
    return std, norm_std


class FeedForward(nn.Module):
    dim: int
    hid_dim: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hid_dim, name="fc1", dtype=self.dtype)(x))
        return nn.Dense(self.dim, name="fc2", dtype=self.dtype)(x)


class ViewAttention(nn.Module):
    """Subtraction-based attention over source views (reference Attention2D).

    attn = softmax_v(attn_fc(k - q + pos_fc(ray_diff))) with invalid views
    masked to -inf; rows where every view is invalid attend un-masked.
    out = sum_v (v + pos) * attn.
    """

    dim: int
    dtype: str = "float32"
    ret_view_std: bool = True

    @nn.compact
    def __call__(self, q, k, pos, mask):
        # q: [..., S, C]; k: [..., S, V, C]; pos: [..., S, V, 4];
        # mask: [..., S, V, 1] (1 = valid)
        qp = nn.Dense(self.dim, use_bias=False, name="q_fc", dtype=self.dtype)(q)
        kp = nn.Dense(self.dim, use_bias=False, name="k_fc", dtype=self.dtype)(k)
        vp = nn.Dense(self.dim, use_bias=False, name="v_fc", dtype=self.dtype)(kp)

        if self.ret_view_std:
            k_std, k_norm_std = masked_view_std(kp, mask)
        else:
            # diagnostics disabled: the std statistics are saved-only outputs
            # (never composited into rgb); skipping them removes several full
            # HBM passes over the [S, V, C] activations per block
            zero = jnp.zeros(kp.shape[:-2] + (kp.shape[-1],), kp.dtype)
            k_std, k_norm_std = zero, zero

        pos_emb = nn.Dense(self.dim, name="pos_fc_1", dtype=self.dtype)(
            nn.relu(nn.Dense(self.dim // 8, name="pos_fc_0", dtype=self.dtype)(pos))
        )
        logits = kp - qp[..., None, :] + pos_emb
        logits = nn.Dense(self.dim, name="attn_fc_1", dtype=self.dtype)(
            nn.relu(nn.Dense(self.dim // 8, name="attn_fc_0", dtype=self.dtype)(logits))
        )

        cnt = jnp.sum(mask, axis=-2, keepdims=True)  # [..., S, 1, 1]
        eff_mask = jnp.where(cnt == 0, jnp.ones_like(mask), mask)
        logits = jnp.where(eff_mask == 0, -jnp.inf, logits)
        attn = jax.nn.softmax(logits, axis=-2)  # over views

        x = jnp.sum((vp + pos_emb) * attn, axis=-2)  # [..., S, C]
        x = nn.Dense(self.dim, name="out_fc", dtype=self.dtype)(x)
        return x, attn, k_std, k_norm_std


class ViewTransformerBlock(nn.Module):
    """Pre-LN view-attention + feed-forward block (reference Transformer2D)."""

    dim: int
    dtype: str = "float32"
    ret_view_std: bool = True

    @nn.compact
    def __call__(self, q, k, pos, mask):
        x = nn.LayerNorm(epsilon=1e-6, name="attn_norm", dtype=self.dtype)(q)
        x, attn, k_std, k_norm_std = ViewAttention(
            self.dim, dtype=self.dtype, ret_view_std=self.ret_view_std,
            name="attn",
        )(x, k, pos, mask)
        x = x + q
        y = nn.LayerNorm(epsilon=1e-6, name="ff_norm", dtype=self.dtype)(x)
        y = FeedForward(self.dim, self.dim * 4, dtype=self.dtype, name="ff")(y)
        return y + x, attn, k_std, k_norm_std


class RayAttention(nn.Module):
    """Multi-head QK self-attention over samples (reference Attention)."""

    dim: int
    n_heads: int = 4
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        # x: [..., S, C]
        s = x.shape[-2]
        hd = self.dim // self.n_heads

        def split(t):
            t = t.reshape(t.shape[:-1] + (self.n_heads, hd))
            return jnp.swapaxes(t, -2, -3)  # [..., H, S, hd]

        q = split(nn.Dense(self.dim, use_bias=False, name="q_fc", dtype=self.dtype)(x))
        k = split(nn.Dense(self.dim, use_bias=False, name="k_fc", dtype=self.dtype)(x))
        v = split(nn.Dense(self.dim, use_bias=False, name="v_fc", dtype=self.dtype)(x))
        logits = jnp.einsum("...qd,...kd->...qk", q, k) / jnp.sqrt(float(hd))
        attn = jax.nn.softmax(logits, axis=-1)  # [..., H, S, S]
        out = jnp.einsum("...qk,...kd->...qd", attn, v)
        out = jnp.swapaxes(out, -2, -3).reshape(x.shape[:-1] + (self.dim,))
        out = nn.Dense(self.dim, name="out_fc", dtype=self.dtype)(out)
        # reference quirk: per-sample weights = head-mean of the FIRST query
        # row of the attention matrix (transformer_network.py:336)
        weights = jnp.mean(attn, axis=-3)[..., 0, :]  # [..., S]
        return out, weights


class RayTransformerBlock(nn.Module):
    dim: int
    n_heads: int = 4
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, name="attn_norm", dtype=self.dtype)(x)
        y, weights = RayAttention(
            self.dim, self.n_heads, dtype=self.dtype, name="attn"
        )(y)
        x = x + y
        z = nn.LayerNorm(epsilon=1e-6, name="ff_norm", dtype=self.dtype)(x)
        z = FeedForward(self.dim, self.dim * 4, dtype=self.dtype, name="ff")(z)
        return x + z, weights


class GNTBlockPair(nn.Module):
    """Two consecutive GNT blocks as a scan body.

    The reference alternates [view transformer -> (q_fc on even blocks) ->
    ray transformer]; grouping an (even, odd) pair makes every iteration
    identical, so the whole depth-8 stack compiles as ONE scanned body
    (4 iterations) instead of 8 inlined blocks — ~4x smaller HLO, which
    matters because this environment's TPU compiles are remote and slow.
    """

    dim: int
    dtype: str = "float32"
    ret_view_std: bool = True

    @nn.compact
    def __call__(self, q, h, ray_diff, mask, pts_code, view_code):
        stds, nstds = [], []
        q, _a, k_std, k_nstd = ViewTransformerBlock(
            self.dim, dtype=self.dtype, ret_view_std=self.ret_view_std,
            name="view_trans_a",
        )(q, h, ray_diff, mask)
        stds.append(jnp.mean(k_std, axis=-1))
        nstds.append(jnp.mean(k_nstd, axis=-1))
        q = jnp.concatenate([q, pts_code, view_code], axis=-1)
        q = nn.Dense(self.dim, name="q_fc_0", dtype=self.dtype)(q)
        q = nn.Dense(self.dim, name="q_fc_1", dtype=self.dtype)(nn.relu(q))
        q, _w = RayTransformerBlock(self.dim, dtype=self.dtype, name="ray_trans_a")(q)

        q, _a, k_std, k_nstd = ViewTransformerBlock(
            self.dim, dtype=self.dtype, ret_view_std=self.ret_view_std,
            name="view_trans_b",
        )(q, h, ray_diff, mask)
        stds.append(jnp.mean(k_std, axis=-1))
        nstds.append(jnp.mean(k_nstd, axis=-1))
        q, weights = RayTransformerBlock(
            self.dim, dtype=self.dtype, name="ray_trans_b"
        )(q)
        return q, (weights, jnp.stack(stds, -1), jnp.stack(nstds, -1))


class GNT(nn.Module):
    """Full GNT: per-sample view aggregation + along-ray reasoning.

    Call with epipolar-sampled features; returns per-ray rgb, per-sample
    compositing weights and the per-block view-consistency diagnostics the
    composition layer consumes.
    """

    netwidth: int = 64
    depth: int = 8
    in_feat_ch: int = 32
    n_freqs: int = 10
    max_freq_log2: float = 9.0
    dtype: str = "float32"  # activation dtype; bfloat16 on TPU halves HBM
    #                         traffic and rides the MXU natively; params and
    #                         the final rgb/weights stay float32
    ret_view_std: bool = True  # per-block view-consistency diagnostics

    @nn.compact
    def __call__(self, rgb_feat, ray_diff, mask, pts, ray_d):
        """
        Args:
          rgb_feat: [..., S, V, 3 + in_feat_ch] sampled rgb+features.
          ray_diff: [..., S, V, 4] ray-difference code.
          mask: [..., S, V, 1] validity (in-front & in-bounds & not-dynamic).
          pts: [..., S, 3] world sample positions.
          ray_d: [..., 3] ray directions (unnormalized ok).

        Returns dict: rgb [..., 3], weights [..., S],
          view_std / view_std_normalized [..., S, depth+1].
        """
        viewdirs = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
        view_code = sinusoidal_embed(viewdirs, self.n_freqs, self.max_freq_log2)
        pts_code = sinusoidal_embed(pts, self.n_freqs, self.max_freq_log2)
        view_code = jnp.broadcast_to(
            view_code[..., None, :], pts_code.shape[:-1] + (view_code.shape[-1],)
        )

        rgb_feat = rgb_feat.astype(self.dtype)
        ray_diff = ray_diff.astype(self.dtype)
        h = nn.Dense(self.netwidth, name="rgbfeat_fc_0", dtype=self.dtype)(rgb_feat)
        h = nn.Dense(self.netwidth, name="rgbfeat_fc_1", dtype=self.dtype)(nn.relu(h))
        q = jnp.max(h, axis=-2)  # maxpool over views: [..., S, C]

        if self.ret_view_std:
            std0, nstd0 = masked_view_std(h, jnp.ones_like(mask))
            # reference's pre-block diagnostics use raw (unmasked) view std of
            # the projected features (transformer_network.py:464-473)
            view_std_list = [jnp.mean(std0, axis=-1)]
            view_nstd_list = [jnp.mean(nstd0, axis=-1)]
        else:
            zero = jnp.zeros(q.shape[:-1], q.dtype)
            view_std_list = [zero]
            view_nstd_list = [zero]

        assert self.depth % 2 == 0, "GNT depth must be even (scanned in pairs)"
        n_pairs = self.depth // 2
        pts_code = pts_code.astype(self.dtype)
        view_code = view_code.astype(self.dtype)

        scanned = nn.scan(
            GNTBlockPair,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=nn.broadcast,
            out_axes=0,
            length=n_pairs,
        )(
            self.netwidth,
            dtype=self.dtype,
            ret_view_std=self.ret_view_std,
            name="block_pairs",
        )

        q, (weights_all, stds_all, nstds_all) = scanned(
            q, h, ray_diff, mask, pts_code, view_code
        )
        weights = weights_all[-1]

        # per-layer diagnostics: [pairs, ..., S, 2] -> list order block 0..7
        std_layers = jnp.moveaxis(stds_all, 0, -2).reshape(
            stds_all.shape[1:-1] + (self.depth,)
        )
        nstd_layers = jnp.moveaxis(nstds_all, 0, -2).reshape(
            nstds_all.shape[1:-1] + (self.depth,)
        )
        view_std = jnp.concatenate(
            [view_std_list[0][..., None], std_layers], axis=-1
        )
        view_nstd = jnp.concatenate(
            [view_nstd_list[0][..., None], nstd_layers], axis=-1
        )

        hq = nn.LayerNorm(name="norm", dtype=self.dtype)(q)
        rgb = nn.Dense(3, name="rgb_fc", dtype=self.dtype)(jnp.mean(hq, axis=-2))

        return {
            "rgb": rgb.astype(jnp.float32),
            "weights": weights.astype(jnp.float32),
            "view_std": view_std,
            "view_std_normalized": view_nstd,
        }

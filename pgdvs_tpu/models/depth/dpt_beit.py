"""MiDaS DPT-BEiT relative-depth backbone (flax) for ZoeDepth.

The reference's depth preprocessing builds ZoeDepth N/K/NK over the MiDaS
``dpt_beit_large_384`` core (``compute_zoedepth.py:146-166``; MiDaS/Zoe code
lives in third_parties, not vendored). This is a from-scratch flax
implementation of that architecture against the PUBLISHED checkpoint layout
(timm ``beit_large_patch16_384`` inside ``pretrained.model`` + the DPT
reassemble/fusion decoder under ``pretrained.act_postprocess*`` /
``scratch.*``), so the released ``ZoeD_M12_*.pt`` weights port by key name
(``zoe_port.py``) the moment they are provisioned.

Architecture (MiDaS v3.1 ``dpt_beit_large_384``):
  * BEiT-L/16: patch conv, cls token, 24 pre-LN blocks with per-block
    relative-position bias tables (no absolute pos-embed), q/v-only biases,
    layer-scale gammas; hooks on blocks [5, 11, 17, 23];
  * DPT reassemble: project-readout (token ⊕ cls -> linear+GELU), 1x1 conv
    to [256, 512, 1024, 1024], then x4 / x2 deconv, identity, /2 conv;
  * scratch: 3x3 no-bias ``layer{i}_rn`` to 256ch, RefineNet-style fusion
    (ResidualConvUnits + align_corners=True x2 upsample + 1x1 out_conv),
    and the 5-layer output head for relative depth.

Returns (rel_depth [H, W], out_conv_feat [H/2, W/2, 32], l4_rn bottleneck
[H/32, W/32, 256], [r4, r3, r2, r1] pyramid) — exactly the hook set Zoe's
metric head consumes (zoedepth midas.py attaches to out_conv/l4_rn/r1..r4).

TPU notes: attention is standard dense [tokens, 1024] MXU work; the
relative-position table lookup is precomputed per static grid at trace time
(numpy index, no device gather); tables for non-pretrained grids are
bicubic-resized like timm/MiDaS do for dynamic input sizes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def gen_relative_position_index(h: int, w: int) -> np.ndarray:
    """timm BEiT relative_position_index for an (h, w) token grid (+cls)."""
    num_rel = (2 * h - 1) * (2 * w - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    n = h * w
    idx = np.zeros((n + 1, n + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel - 3
    idx[0:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


def resize_rel_pos_table(table, src_hw, dst_hw):
    """Bicubic-resize the spatial part of a relative-position bias table
    from a (2h-1)x(2w-1) source grid to the destination grid, keeping the
    3 trailing cls entries (timm/MiDaS dynamic-size behavior)."""
    sh, sw = 2 * src_hw[0] - 1, 2 * src_hw[1] - 1
    dh, dw = 2 * dst_hw[0] - 1, 2 * dst_hw[1] - 1
    heads = table.shape[-1]
    if (sh, sw) == (dh, dw):
        return table
    spatial = table[: sh * sw].reshape(sh, sw, heads)
    resized = jax.image.resize(spatial, (dh, dw, heads), "cubic")
    return jnp.concatenate([resized.reshape(dh * dw, heads), table[-3:]], 0)


class BeitAttention(nn.Module):
    dim: int
    n_heads: int
    pretrained_grid: Tuple[int, int]

    @nn.compact
    def __call__(self, x, grid_hw):
        # x: [N+1, C]
        hd = self.dim // self.n_heads
        n_tok = x.shape[0]
        qkv_w = self.param(
            "qkv_kernel", nn.initializers.xavier_uniform(),
            (self.dim, 3 * self.dim),
        )
        q_bias = self.param("q_bias", nn.initializers.zeros, (self.dim,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (self.dim,))
        num_rel = (
            (2 * self.pretrained_grid[0] - 1)
            * (2 * self.pretrained_grid[1] - 1)
            + 3
        )
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.zeros,
            (num_rel, self.n_heads),
        )

        qkv = x @ qkv_w  # [N, 3C]
        qkv = qkv + jnp.concatenate(
            [q_bias, jnp.zeros_like(q_bias), v_bias]
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(n_tok, self.n_heads, hd).transpose(1, 0, 2)

        q, k, v = heads(q) * (hd ** -0.5), heads(k), heads(v)
        logits = jnp.einsum("hqd,hkd->hqk", q, k)

        table_r = resize_rel_pos_table(table, self.pretrained_grid, grid_hw)
        idx = gen_relative_position_index(*grid_hw)  # numpy, trace-time
        bias = table_r[idx.reshape(-1)].reshape(
            n_tok, n_tok, self.n_heads
        )
        logits = logits + bias.transpose(2, 0, 1)

        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("hqk,hkd->hqd", attn, v)
        out = out.transpose(1, 0, 2).reshape(n_tok, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class BeitBlock(nn.Module):
    dim: int
    n_heads: int
    mlp_ratio: float
    pretrained_grid: Tuple[int, int]

    @nn.compact
    def __call__(self, x, grid_hw):
        g1 = self.param("gamma_1", nn.initializers.ones, (self.dim,))
        g2 = self.param("gamma_2", nn.initializers.ones, (self.dim,))
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + g1 * BeitAttention(
            self.dim, self.n_heads, self.pretrained_grid, name="attn"
        )(y, grid_hw)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        # exact (erf) GELU: timm BEiT / torch nn.GELU semantics
        y = nn.Dense(self.dim, name="mlp_fc2")(nn.gelu(y, approximate=False))
        return x + g2 * y


def _resize_bilinear_ac(x, out_h, out_w):
    """F.interpolate(..., mode='bilinear', align_corners=True) semantics
    (jax.image.resize is half-pixel/antialias — different)."""
    h, w = x.shape[0], x.shape[1]

    def axis_interp(arr, out_n, in_n, axis):
        if in_n == 1:
            reps = [1] * arr.ndim
            reps[axis] = out_n
            return jnp.tile(arr, reps)
        pos = jnp.arange(out_n) * ((in_n - 1) / max(out_n - 1, 1))
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_n - 1)
        t = (pos - lo).astype(arr.dtype)
        a = jnp.take(arr, lo, axis=axis)
        b = jnp.take(arr, hi, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = out_n
        t = t.reshape(shape)
        return a * (1 - t) + b * t

    x = axis_interp(x, out_h, h, 0)
    return axis_interp(x, out_w, w, 1)


class ResidualConvUnit(nn.Module):
    """MiDaS ResidualConvUnit_custom (bn=False): activation-first convs."""

    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    """MiDaS FeatureFusionBlock_custom (deconv/bn/expand off)."""

    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="resConfUnit1")(skip)
        x = ResidualConvUnit(self.features, name="resConfUnit2")(x)
        x = _resize_bilinear_ac(x, x.shape[0] * 2, x.shape[1] * 2)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class _DeconvBlock(nn.Module):
    """torch ConvTranspose2d with stride == kernel (non-overlapping): a
    per-pixel linear into k x k output blocks — written as einsum+reshape so
    the semantics match torch exactly (no kernel-flip ambiguity)."""

    features: int
    k: int

    @nn.compact
    def __call__(self, x):
        h, w, cin = x.shape
        kern = self.param(
            "kernel", nn.initializers.xavier_uniform(),
            (cin, self.features, self.k, self.k),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        out = jnp.einsum("hwi,iokl->hkwlo", x, kern)
        return out.reshape(h * self.k, w * self.k, self.features) + bias


class DPTBeitBackbone(nn.Module):
    """BEiT + DPT decoder; returns Zoe's hook set.

    Defaults are ``dpt_beit_large_384``. H, W must be divisible by 32.
    """

    embed_dim: int = 1024
    depth: int = 24
    n_heads: int = 16
    mlp_ratio: float = 4.0
    patch: int = 16
    hooks: Sequence[int] = (5, 11, 17, 23)
    features: int = 256
    reassemble_channels: Sequence[int] = (256, 512, 1024, 1024)
    pretrained_grid: Tuple[int, int] = (24, 24)
    head_features: Tuple[int, int] = (128, 32)

    @nn.compact
    def __call__(self, img):
        """img: [H, W, 3] (ImageNet-normalized by the caller)."""
        h, w = img.shape[0], img.shape[1]
        gh, gw = h // self.patch, w // self.patch
        grid_hw = (gh, gw)

        x = nn.Conv(
            self.embed_dim,
            (self.patch, self.patch),
            strides=(self.patch, self.patch),
            name="patch_embed",
        )(img[None])[0].reshape(gh * gw, self.embed_dim)
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, self.embed_dim)
        )
        x = jnp.concatenate([cls, x], axis=0)

        hook_set = set(self.hooks)
        layers = []
        for i in range(self.depth):
            x = BeitBlock(
                self.embed_dim,
                self.n_heads,
                self.mlp_ratio,
                self.pretrained_grid,
                name=f"block_{i}",
            )(x, grid_hw)
            if i in hook_set:
                layers.append(x)

        # ---- DPT reassemble (project readout -> conv -> rescale) --------
        def readout(tokens, idx):
            cls_t = jnp.broadcast_to(tokens[0:1], tokens[1:].shape)
            y = jnp.concatenate([tokens[1:], cls_t], axis=-1)
            y = nn.Dense(self.embed_dim, name=f"readout_{idx}")(y)
            return nn.gelu(y, approximate=False).reshape(gh, gw, self.embed_dim)

        maps = []
        for i, tokens in enumerate(layers):
            y = readout(tokens, i)
            y = nn.Conv(
                self.reassemble_channels[i], (1, 1), name=f"proj_{i}"
            )(y)
            if i == 0:
                y = _DeconvBlock(
                    self.reassemble_channels[0], 4, name="deconv_0"
                )(y)
            elif i == 1:
                y = _DeconvBlock(
                    self.reassemble_channels[1], 2, name="deconv_1"
                )(y)
            elif i == 3:
                y = nn.Conv(
                    self.reassemble_channels[3],
                    (3, 3),
                    strides=(2, 2),
                    padding=1,
                    name="downconv_3",
                )(y)
            maps.append(y)

        rn = [
            nn.Conv(
                self.features, (3, 3), padding=1, use_bias=False,
                name=f"layer{i + 1}_rn",
            )(m)
            for i, m in enumerate(maps)
        ]  # resolutions: H/4, H/8, H/16, H/32

        r4 = FeatureFusionBlock(self.features, name="refinenet4")(rn[3])
        r3 = FeatureFusionBlock(self.features, name="refinenet3")(r4, rn[2])
        r2 = FeatureFusionBlock(self.features, name="refinenet2")(r3, rn[1])
        r1 = FeatureFusionBlock(self.features, name="refinenet1")(r2, rn[0])

        # ---- output head ------------------------------------------------
        f1, f2 = self.head_features
        y = nn.Conv(f1, (3, 3), padding=1, name="head_conv0")(r1)
        y = _resize_bilinear_ac(y, y.shape[0] * 2, y.shape[1] * 2)
        out_conv_feat = nn.relu(
            nn.Conv(f2, (3, 3), padding=1, name="head_conv2")(y)
        )
        # MiDaS scratch.output_conv.4 is a 1x1 conv (Conv2d(32, 1, 1))
        rel = nn.relu(
            nn.Conv(1, (1, 1), padding=0, name="head_conv4")(out_conv_feat)
        )[..., 0]

        return rel, out_conv_feat, rn[3], [r4, r3, r2, r1]


# ImageNet normalization MiDaS applies before the core
_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class ZoeDepthDPT(nn.Module):
    """DPT-BEiT backbone + checkpoint-faithful metric head -> metric depth.

    The Zoe wiring (zoedepth.py forward): bottleneck = scratch.layer4_rn,
    attractor features = refinenet outputs r4..r1 (coarse -> fine), main
    feature = the head's 32ch activation, conditioning on the relative
    depth (single head) — heads A/B-validated vs the HF transformers port
    (tests/test_zoe_head_ab.py).

    variant: "single" (ZoeD_M12_N / _K — set min/max_depth to the domain's
    range: NYU 1e-3..10, KITTI 1e-3..80) or "nk" (ZoeD_M12_NK, two routed
    domain heads).
    """

    n_bins: int = 64
    min_depth: float = 1e-3
    max_depth: float = 10.0
    variant: str = "single"
    backbone_kwargs: Optional[dict] = None
    head_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, img):
        from pgdvs_tpu.models.depth.zoe_head import (
            ZoeMetricHeadMulti,
            ZoeMetricHeadSingle,
        )

        kw = self.backbone_kwargs or {}
        hkw = self.head_kwargs or {}
        x = (img - _IMAGENET_MEAN) / _IMAGENET_STD
        rel, out_conv_feat, l4_rn, pyramid = DPTBeitBackbone(
            name="midas", **kw
        )(x)
        if self.variant == "single":
            depth = ZoeMetricHeadSingle(
                self.n_bins,
                min_depth=self.min_depth,
                max_depth=self.max_depth,
                name="head",
                **hkw,
            )(out_conv_feat, l4_rn, pyramid, rel)
        elif self.variant == "nk":
            depth, _logits = ZoeMetricHeadMulti(name="head", **hkw)(
                out_conv_feat, l4_rn, pyramid, rel
            )
        else:
            raise ValueError(f"unknown Zoe variant {self.variant!r}")
        h, w = img.shape[0], img.shape[1]
        return jax.image.resize(depth, (h, w, 1), "bilinear")[..., 0]

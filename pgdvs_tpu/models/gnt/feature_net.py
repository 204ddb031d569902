"""ResUNet image feature extractor for GNT (flax / NHWC).

Architecturally matches the reference feature net
(``/root/reference/pgdvs/models/gnt/models/feature_network.py:182-333``) so
its pretrained weights can be ported 1:1:

  * ResNet34-style encoder (BasicBlock stacks [3, 4, 6] at strides 2/2/2 on
    top of a stride-2 7x7 stem) with reflect-padded convs and
    InstanceNorm (no running stats, affine);
  * two-level decoder: x2 bilinear (align_corners) upsample + reflect conv +
    InstanceNorm + ELU, with encoder skip concats;
  * 1x1 out conv -> 32-channel feature map at 1/4 input resolution
    (single_net=True: coarse and fine maps share channels).

TPU notes: channel-last layout, conv matmuls ride the MXU in the default
(bf16) precision; InstanceNorm is GroupNorm with group_size=1.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ReflectConv(nn.Module):
    """Conv2D with reflect padding (torch padding_mode='reflect')."""

    features: int
    kernel: int
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        if pad > 0:
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="VALID",
            use_bias=self.use_bias,
        )(x)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel spatial normalization with affine params.

    Equivalent to torch InstanceNorm2d(affine=True, track_running_stats=False)
    in eval mode (biased variance over H, W; eps=1e-5).
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=None, group_size=1, epsilon=self.epsilon, use_bias=True,
            use_scale=True
        )(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = ReflectConv(self.planes, 3, self.stride, name="conv1")(x)
        out = InstanceNorm(name="bn1")(out)
        out = nn.relu(out)
        out = ReflectConv(self.planes, 3, 1, name="conv2")(out)
        out = InstanceNorm(name="bn2")(out)
        if self.downsample:
            identity = ReflectConv(self.planes, 1, self.stride, name="down_conv")(x)
            identity = InstanceNorm(name="down_bn")(identity)
        return nn.relu(out + identity)


class ConvINElu(nn.Module):
    """Decoder conv: reflect conv + InstanceNorm + ELU (reference `conv`)."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        x = ReflectConv(self.features, self.kernel, 1, use_bias=True, name="conv")(x)
        x = InstanceNorm(name="bn")(x)
        return nn.elu(x)


def _upsample2x(x):
    """Bilinear x2 upsample with align_corners=True corner mapping."""
    from pgdvs_tpu.core.interpolate import resize_bilinear
    import jax

    n, h, w, c = x.shape
    return jax.vmap(lambda im: resize_bilinear(im, 2 * h, 2 * w))(x)


class ResUNet(nn.Module):
    layers: Sequence[int] = (3, 4, 6)
    out_channels: int = 32

    @nn.compact
    def __call__(self, x):
        """x: [N, H, W, 3] -> features [N, H/4, W/4, out_channels]."""
        # stem: 7x7 stride 2
        h = ReflectConv(64, 7, 2, name="conv1")(x)
        h = InstanceNorm(name="bn1")(h)
        h = nn.relu(h)

        def stack(h, planes, blocks, name):
            in_ch = h.shape[-1]
            h = BasicBlock(
                planes, stride=2, downsample=True, name=f"{name}_0"
            )(h)
            for i in range(1, blocks):
                h = BasicBlock(planes, name=f"{name}_{i}")(h)
            return h

        x1 = stack(h, 64, self.layers[0], "layer1")  # H/4
        x2 = stack(x1, 128, self.layers[1], "layer2")  # H/8
        x3 = stack(x2, 256, self.layers[2], "layer3")  # H/16

        # decoder skip concat: reference skipconnect(x2=encoder, x=upsampled)
        # binds x1:=encoder, x2:=upsampled, center-pads the ENCODER map to the
        # upsampled extent (diff is always 0 or +1: up(d)=2*ceil(e/2) >= e)
        # and concats [upsampled, encoder] (feature_network.py:296-307) —
        # verified numerically vs the torch oracle in tests/test_torch_parity
        u3 = ConvINElu(128, name="upconv3")(_upsample2x(x3))  # H/8
        u3 = ConvINElu(128, name="iconv3")(
            jnp.concatenate([u3, _match_to(x2, u3)], axis=-1)
        )
        u2 = ConvINElu(64, name="upconv2")(_upsample2x(u3))  # H/4
        u2 = ConvINElu(self.out_channels, name="iconv2")(
            jnp.concatenate([u2, _match_to(x1, u2)], axis=-1)
        )
        out = nn.Conv(self.out_channels, (1, 1), name="out_conv")(u2)
        return out


def _match_to(x, ref):
    """Pad/crop x's spatial dims to ref's with torch F.pad center semantics.

    diff = ref - x; pad (diff//2) on the left/top and (diff - diff//2) on the
    right/bottom; negative amounts crop (torch F.pad negative-pad behavior,
    used by the reference skipconnect at odd extents).
    """

    def one(x, axis, target):
        d = target - x.shape[axis]
        if d == 0:
            return x
        lo, hi = d // 2, d - d // 2
        if lo < 0:
            x = jax.lax.slice_in_dim(x, -lo, x.shape[axis], axis=axis)
            lo = 0
        if hi < 0:
            x = jax.lax.slice_in_dim(x, 0, x.shape[axis] + hi, axis=axis)
            hi = 0
        if lo or hi:
            pad = [(0, 0)] * x.ndim
            pad[axis] = (lo, hi)
            x = jnp.pad(x, pad)
        return x

    x = one(x, 1, ref.shape[1])
    return one(x, 2, ref.shape[2])

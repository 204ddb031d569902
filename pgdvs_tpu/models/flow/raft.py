"""RAFT optical flow (flax) — recurrent all-pairs field transforms.

The reference runs RAFT as an external third-party repo for flow
preprocessing (``/root/reference/pgdvs/preprocess/compute_flow.py:221-238``:
32 iterations, forward + backward, ``raft-things.pth``). This is a clean
implementation of the published architecture (Teed & Deng, ECCV 2020)
shaped to load the princeton-vl checkpoint via ``raft_port``:

  * feature encoder (instance-norm residual encoder, 1/8 res, 256 ch)
  * context encoder (batch-norm variant, split 128 hidden + 128 context)
  * all-pairs correlation, 4-level average-pooled pyramid, radius-4 lookup
  * separable ConvGRU update operator + convex-combination upsampling

TPU notes: the all-pairs correlation is one [H8*W8, C] x [C, H8*W8] matmul
(MXU); the radius-4 pyramid lookup reuses the framework bilinear sampler
(batched gathers); iterations run as a python loop inside one jit (static
iteration count, the reference's test-mode contract).
"""

from __future__ import annotations

import dataclasses
import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pgdvs_tpu.core.interpolate import bilinear_sample

HDIM = 128
CDIM = 128
CORR_LEVELS = 4
CORR_RADIUS = 4


class _IN(nn.Module):
    """InstanceNorm2d(affine=False) over NHWC (RAFT norm_fn='instance')."""

    @nn.compact
    def __call__(self, x):
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=(1, 2), keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5)


class _BN(nn.Module):
    """BatchNorm2d in eval mode (running statistics from the checkpoint)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


class _Conv(nn.Module):
    features: int
    kernel: tuple
    stride: int = 1
    pad: tuple = (0, 0)

    @nn.compact
    def __call__(self, x):
        ph, pw = self.pad
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        return nn.Conv(
            self.features,
            self.kernel,
            strides=(self.stride, self.stride),
            padding="VALID",
            name="conv",
        )(x)


class _ResBlock(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "instance"

    def _norm(self, name):
        return _IN(name=name) if self.norm == "instance" else _BN(
            self.planes, name=name
        )

    @nn.compact
    def __call__(self, x):
        y = nn.relu(self._norm("norm1")(
            _Conv(self.planes, (3, 3), self.stride, (1, 1), name="conv1")(x)
        ))
        y = nn.relu(self._norm("norm2")(
            _Conv(self.planes, (3, 3), 1, (1, 1), name="conv2")(y)
        ))
        if self.stride != 1:
            x = self._norm("norm3")(
                _Conv(self.planes, (1, 1), self.stride, (0, 0),
                      name="downsample")(x)
            )
        return nn.relu(x + y)


class BasicEncoderRAFT(nn.Module):
    """RAFT BasicEncoder: 1/8-res feature map."""

    output_dim: int = 256
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        norm1 = (_IN(name="norm1") if self.norm == "instance"
                 else _BN(64, name="norm1"))
        x = nn.relu(norm1(_Conv(64, (7, 7), 2, (3, 3), name="conv1")(x)))
        for li, (planes, stride) in enumerate([(64, 1), (96, 2), (128, 2)]):
            x = _ResBlock(planes, stride, self.norm, name=f"layer{li + 1}_0")(x)
            x = _ResBlock(planes, 1, self.norm, name=f"layer{li + 1}_1")(x)
        return _Conv(self.output_dim, (1, 1), 1, (0, 0), name="conv2")(x)


class MotionEncoder(nn.Module):
    """BasicMotionEncoder: (corr, flow) -> 128-ch motion features."""

    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(_Conv(256, (1, 1), 1, (0, 0), name="convc1")(corr))
        c = nn.relu(_Conv(192, (3, 3), 1, (1, 1), name="convc2")(c))
        f = nn.relu(_Conv(128, (7, 7), 1, (3, 3), name="convf1")(flow))
        f = nn.relu(_Conv(64, (3, 3), 1, (1, 1), name="convf2")(f))
        out = nn.relu(
            _Conv(126, (3, 3), 1, (1, 1), name="conv")(
                jnp.concatenate([c, f], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)  # 128


class SepConvGRU(nn.Module):
    """Separable (1x5 then 5x1) convolutional GRU."""

    @nn.compact
    def __call__(self, h, x):
        for suffix, kern, pad in (("1", (1, 5), (0, 2)), ("2", (5, 1), (2, 0))):
            hx = jnp.concatenate([h, x], axis=-1)
            z = jax.nn.sigmoid(
                _Conv(HDIM, kern, 1, pad, name=f"convz{suffix}")(hx)
            )
            r = jax.nn.sigmoid(
                _Conv(HDIM, kern, 1, pad, name=f"convr{suffix}")(hx)
            )
            q = jnp.tanh(
                _Conv(HDIM, kern, 1, pad, name=f"convq{suffix}")(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            h = (1.0 - z) * h + z * q
        return h


class UpdateBlock(nn.Module):
    """BasicUpdateBlock: motion encoder + GRU + flow head + upsample mask."""

    @nn.compact
    def __call__(self, h, context, corr, flow):
        motion = MotionEncoder(name="encoder")(flow, corr)
        x = jnp.concatenate([context, motion], axis=-1)
        h = SepConvGRU(name="gru")(h, x)
        d = nn.relu(_Conv(256, (3, 3), 1, (1, 1), name="flow_head_conv1")(h))
        delta = _Conv(2, (3, 3), 1, (1, 1), name="flow_head_conv2")(d)
        m = nn.relu(_Conv(256, (3, 3), 1, (1, 1), name="mask_conv1")(h))
        mask = _Conv(64 * 9, (1, 1), 1, (0, 0), name="mask_conv2")(m)
        return h, 0.25 * mask, delta


def build_corr_pyramid(fmap1, fmap2, num_levels: int = CORR_LEVELS):
    """All-pairs correlation pyramid.

    fmap1/fmap2: [H8, W8, C]. Returns list of [H8*W8, Hl, Wl] volumes
    (normalized by sqrt(C)), average-pooled per level.
    """
    h8, w8, c = fmap1.shape
    corr = jnp.einsum(
        "ac,bc->ab", fmap1.reshape(-1, c), fmap2.reshape(-1, c),
        preferred_element_type=jnp.float32,
    ) / np.sqrt(c)
    corr = corr.reshape(h8 * w8, h8, w8)
    pyr = [corr]
    cur = corr
    for _ in range(num_levels - 1):
        n, hh, ww = cur.shape
        # avg-pool 2x2 per dim; dims that reached 1 stay 1 (only occurs on
        # tiny test inputs — real 1/8-res maps are >= 8 per side)
        if hh >= 2:
            cur = cur[:, : hh // 2 * 2].reshape(n, hh // 2, 2, -1).mean(axis=2)
        if ww >= 2:
            nh = cur.shape[1]
            cur = cur[:, :, : ww // 2 * 2].reshape(n, nh, ww // 2, 2).mean(
                axis=3
            )
        pyr.append(cur)
    return pyr


def lookup_corr(pyr, coords, radius: int = CORR_RADIUS):
    """Radius lookup: per pixel, a (2r+1)^2 window around coords per level.

    coords: [H8, W8, 2] (x, y) at level-0 scale. Returns [H8, W8, L*(2r+1)^2].
    """
    h8, w8 = coords.shape[:2]
    n = h8 * w8
    rr = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    # Reference quirk (princeton-vl RAFT CorrBlock.__call__): the tap window
    # is `delta = stack(meshgrid(dy, dx), -1)` whose channel 0 (= dy, varying
    # along the SLOW axis) is fed to grid_sample's x coordinate. The released
    # checkpoints' motion encoder (convc1) was trained against that transposed
    # enumeration, so we must match it: x takes the slow-axis offset, y the
    # fast-axis one. Same quirk as cotracker.py's corr taps.
    off_slow, off_fast = jnp.meshgrid(rr, rr, indexing="ij")
    off_slow = off_slow.reshape(-1)
    off_fast = off_fast.reshape(-1)
    out = []
    for lvl, corr in enumerate(pyr):
        cl = coords.reshape(n, 2) / (2.0 ** lvl)
        xx = cl[:, 0:1] + off_slow[None]
        yy = cl[:, 1:2] + off_fast[None]
        samp = jax.vmap(
            lambda cmap, x, y: bilinear_sample(cmap[..., None], x, y,
                                               zero_pad=True)[..., 0]
        )(corr, xx, yy)  # [N, K]
        out.append(samp)
    return jnp.concatenate(out, axis=-1).reshape(h8, w8, -1)


def convex_upsample(flow, mask):
    """Convex-combination 8x upsampling (RAFT upsample_flow).

    flow: [H8, W8, 2]; mask: [H8, W8, 576] (= 9 weights x 8x8 positions).
    Returns [8*H8, 8*W8, 2] flow scaled by 8.
    """
    h8, w8, _ = flow.shape
    m = mask.reshape(h8, w8, 9, 8, 8)
    m = jax.nn.softmax(m, axis=2)
    # 3x3 neighborhoods of the (8x) flow
    f = jnp.pad(flow * 8.0, ((1, 1), (1, 1), (0, 0)))
    patches = jnp.stack(
        [
            f[i : i + h8, j : j + w8]
            for i in range(3)
            for j in range(3)
        ],
        axis=2,
    )  # [H8, W8, 9, 2]
    up = jnp.einsum("hwkab,hwkc->hwabc", m, patches)  # [H8, W8, 8, 8, 2]
    return up.transpose(0, 2, 1, 3, 4).reshape(h8 * 8, w8 * 8, 2)


class RAFT(nn.Module):
    """Full RAFT in test mode: (img1, img2) -> upsampled flow."""

    iters: int = 32

    def setup(self):
        self.fnet = BasicEncoderRAFT(256, "instance")
        self.cnet = BasicEncoderRAFT(HDIM + CDIM, "batch")

        self.update_block = UpdateBlock()

    def __call__(self, img1, img2, iters: int = 0):
        """img1/img2: [H, W, 3] in [0, 255], H and W divisible by 8.

        Returns flow [H, W, 2] (x, y displacement in pixels).
        """
        iters = iters or self.iters
        x1 = 2.0 * (img1 / 255.0) - 1.0
        x2 = 2.0 * (img2 / 255.0) - 1.0
        both = jnp.stack([x1, x2])
        fmaps = self.fnet(both)
        fmap1, fmap2 = fmaps[0], fmaps[1]
        h8, w8 = fmap1.shape[0], fmap1.shape[1]

        cnet_out = self.cnet(x1[None])[0]
        h = jnp.tanh(cnet_out[..., :HDIM])
        context = nn.relu(cnet_out[..., HDIM:])

        pyr = build_corr_pyramid(fmap1, fmap2)

        gy, gx = jnp.meshgrid(
            jnp.arange(h8, dtype=jnp.float32),
            jnp.arange(w8, dtype=jnp.float32),
            indexing="ij",
        )
        coords0 = jnp.stack([gx, gy], axis=-1)
        coords1 = coords0

        up_mask = None
        for _ in range(iters):
            corr = lookup_corr(pyr, coords1)
            flow = coords1 - coords0
            h4 = h[None]
            h4, up_mask, delta = self.update_block(
                h4, context[None], corr[None], flow[None]
            )
            h = h4[0]
            coords1 = coords1 + delta[0]

        return convex_upsample(coords1 - coords0, up_mask[0])


@dataclasses.dataclass(frozen=True)
class RAFTFlow:
    """Flow-model contract used by preprocessing: pads to /8, runs fwd+bwd.

    Mirrors ``compute_flow_raft`` (compute_flow.py:221-238): images padded
    replicate-style to multiples of 8 (InputPadder 'sintel' mode splits the
    pad across both sides), 32 iterations, forward and backward flow.
    """

    params: dict
    iters: int = 32

    def __call__(self, img1, img2):
        """img1/img2: [H, W, 3] float in [0, 1]. Returns (flow_fwd, flow_bwd)
        at [H, W, 2]."""
        return _raft_fwd_bwd(self.params, img1, img2, self.iters)

    def one_way(self, img1, img2):
        """Single-direction flow [H, W, 2] — half the model passes; the
        tiling protocols call each direction per patch themselves."""
        return _raft_one_way(self.params, img1, img2, self.iters)


@functools.partial(jax.jit, static_argnums=(3,))
def _raft_fwd_bwd(params, img1, img2, iters):
    h, w = img1.shape[:2]
    ph = (-h) % 8
    pw = (-w) % 8
    # InputPadder sintel mode: [pad_w//2, pad_w - pad_w//2, pad_h//2, ...]
    pads = ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
    a = jnp.pad(img1 * 255.0, pads, mode="edge")
    b = jnp.pad(img2 * 255.0, pads, mode="edge")
    model = RAFT(iters=iters)
    f12 = model.apply(params, a, b)
    f21 = model.apply(params, b, a)

    def unpad(f):
        return f[pads[0][0] : pads[0][0] + h, pads[1][0] : pads[1][0] + w]

    return unpad(f12), unpad(f21)


@functools.partial(jax.jit, static_argnums=(3,))
def _raft_one_way(params, img1, img2, iters):
    h, w = img1.shape[:2]
    ph = (-h) % 8
    pw = (-w) % 8
    pads = ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
    a = jnp.pad(img1 * 255.0, pads, mode="edge")
    b = jnp.pad(img2 * 255.0, pads, mode="edge")
    f12 = RAFT(iters=iters).apply(params, a, b)
    return f12[pads[0][0] : pads[0][0] + h, pads[1][0] : pads[1][0] + w]

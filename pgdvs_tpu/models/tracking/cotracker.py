"""CoTracker (flax) — sliding-window transformer point tracker.

Functional port of the reference's vendored CoTracker
(``/root/reference/pgdvs/models/cotracker/models/core/cotracker/cotracker.py:73-355``,
blocks at ``blocks.py``, predictor contract at ``predictor.py:20-165``,
pgdvs interface at ``cotracker/interface.py:30-82``), checkpoint config
``cotracker_stride_4_wind_8.pth`` (stride=4, S=8, 6 time + 6 space blocks —
``build_cotracker.py:54-66``).

TPU-first redesign (static shapes, no data-dependent control flow):
  * the reference admits points into sliding windows sorted by first-visible
    frame with a data-dependent ``wind_idx`` prefix (``cotracker.py:226-300``);
    here EVERY window processes ALL N query points, with the reference's
    admission/carry-over semantics reproduced by masks:
      - a point whose first frame precedes the window start carries its
        coords/vis from the previous window's second half;
      - a point that first appears inside this window is initialized at its
        query coordinates (whole window);
      - the transformer's track_mask flags exactly the frames the reference
        would flag (new frames not covered by a previous window);
      - outputs are committed only for points already visible to the window
        (``first < ind + S``), so the zero-trajectory convention the
        backward-merge relies on is preserved bit-for-bit.
  * python loops over (static) window starts and refinement iterations;
    everything inside is fixed-shape jnp, jit-able end to end.

Backward (pre-query-frame) tracking follows the predictor: run the model on
the time-flipped video and merge where the forward trajectories are zero
(``predictor.py:166-180``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pgdvs_tpu.core.interpolate import bilinear_sample, resize_bilinear

LATENT_DIM = 128
INPUT_DIM = 456
HIDDEN_SIZE = 384
CORR_LEVELS = 4
CORR_RADIUS = 3


# ---------------------------------------------------------------------------
# embeddings (embeddings.py:11-91)
# ---------------------------------------------------------------------------


def sincos_pos_embed_1d(embed_dim: int, pos):
    """get_1d_sincos_pos_embed_from_grid: [sin | cos] concatenated."""
    omega = jnp.arange(embed_dim // 2, dtype=jnp.float32) / (embed_dim / 2.0)
    omega = 1.0 / (10000.0 ** omega)
    out = pos.reshape(-1)[:, None] * omega[None, :]
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=-1)


def sincos_pos_embed_2d(embed_dim: int, grid_h: int, grid_w: int):
    """get_2d_sincos_pos_embed: [emb_h | emb_w], grid built w-first."""
    gw = jnp.arange(grid_w, dtype=jnp.float32)
    gh = jnp.arange(grid_h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(gw, gh)  # like np.meshgrid(grid_w, grid_h)
    emb_h = sincos_pos_embed_1d(embed_dim // 2, gx)
    emb_w = sincos_pos_embed_1d(embed_dim // 2, gy)
    return jnp.concatenate([emb_h, emb_w], axis=-1)  # [H*W, D]


def embedding_2d_interleaved(xy, c: int):
    """get_2d_embedding(cat_coords=True): interleaved sin/cos per axis,
    coords prepended (embeddings.py:69-91). xy: [..., 2] -> [..., 2 + 2c]."""
    div = jnp.arange(0, c, 2, dtype=jnp.float32) * (1000.0 / c)  # [c/2]
    parts = []
    for i in range(2):
        a = xy[..., i : i + 1] * div  # [..., c/2]
        inter = jnp.stack([jnp.sin(a), jnp.cos(a)], axis=-1)  # [..., c/2, 2]
        parts.append(inter.reshape(a.shape[:-1] + (c,)))
    return jnp.concatenate([xy] + parts, axis=-1)


def bilinear_clamped(img, x, y):
    """bilinear_sample2d semantics: border-clamped taps (model_utils.py:75+).

    img: [H, W, C]; x, y: [...]. Returns [..., C].
    """
    return bilinear_sample(img, x, y, zero_pad=False)


# ---------------------------------------------------------------------------
# feature encoder (blocks.py:77-221; norm_fn='instance' => affine-less IN)
# ---------------------------------------------------------------------------


class _InstanceNorm(nn.Module):
    """torch nn.InstanceNorm2d(affine=False) over NHWC."""

    @nn.compact
    def __call__(self, x):
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=(1, 2), keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5)


class _Conv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    pad: int = 0

    @nn.compact
    def __call__(self, x):
        if self.pad:
            x = jnp.pad(
                x, ((0, 0), (self.pad, self.pad), (self.pad, self.pad), (0, 0))
            )
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="VALID",
            name="conv",
        )(x)


class ResidualBlockF(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.relu(_InstanceNorm()(_Conv(self.planes, 3, self.stride, 1,
                                          name="conv1")(x)))
        y = nn.relu(_InstanceNorm()(_Conv(self.planes, 3, 1, 1, name="conv2")(y)))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = _InstanceNorm()(_Conv(self.planes, 1, self.stride, 0,
                                      name="downsample")(x))
        return nn.relu(x + y)


class BasicEncoderF(nn.Module):
    """RAFT-style multi-scale encoder -> latent feature map at 1/stride.

    blocks.py:77-221 with norm_fn='instance', stride=4: outputs are taken
    from 4 residual stages, all bilinearly (align_corners) resized to
    H/stride and fused by conv2/norm2/relu/conv3.
    """

    output_dim: int = LATENT_DIM
    stride: int = 4

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        ho, wo = h // self.stride, w // self.stride
        x = nn.relu(_InstanceNorm()(_Conv(64, 7, 2, 3, name="conv1")(x)))
        a = ResidualBlockF(64, 1, name="layer1_0")(x)
        a = ResidualBlockF(64, 1, name="layer1_1")(a)
        b = ResidualBlockF(96, 2, name="layer2_0")(a)
        b = ResidualBlockF(96, 2 - 1, name="layer2_1")(b)
        c = ResidualBlockF(128, 2, name="layer3_0")(b)
        c = ResidualBlockF(128, 1, name="layer3_1")(c)
        d = ResidualBlockF(128, 2, name="layer4_0")(c)
        d = ResidualBlockF(128, 1, name="layer4_1")(d)

        def up(t):
            return jax.vmap(lambda im: resize_bilinear(im, ho, wo))(t)

        cat = jnp.concatenate([up(a), up(b), up(c), up(d)], axis=-1)
        y = _Conv(self.output_dim * 2, 3, 1, 1, name="conv2")(cat)
        y = nn.relu(_InstanceNorm()(y))
        return _Conv(self.output_dim, 1, 1, 0, name="conv3")(y)


# ---------------------------------------------------------------------------
# update transformer (blocks.py:223-250, 330-400; timm Attention/Mlp)
# ---------------------------------------------------------------------------


class _VitAttention(nn.Module):
    """timm vision_transformer.Attention: fused qkv (bias), scaled dot,
    output proj."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        # x: [B, N, C]
        b, n, c = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, hd]
        q = jnp.swapaxes(q, 1, 2)  # [B, H, N, hd]
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = jnp.swapaxes(out, 1, 2).reshape(b, n, c)
        return nn.Dense(self.dim, name="proj")(out)


class AttnBlockF(nn.Module):
    """Pre-LN (affine-less) attention + tanh-GELU MLP block."""

    dim: int
    heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        def ln(t):
            mu = jnp.mean(t, axis=-1, keepdims=True)
            var = jnp.mean((t - mu) ** 2, axis=-1, keepdims=True)
            return (t - mu) * jax.lax.rsqrt(var + 1e-6)

        x = x + _VitAttention(self.dim, self.heads, name="attn")(ln(x))
        y = ln(x)
        hid = int(self.dim * self.mlp_ratio)
        y = nn.Dense(hid, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=True)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + y


class UpdateFormerF(nn.Module):
    """Interleaved time/space attention over [N, T, C] track tokens."""

    time_depth: int = 6
    space_depth: int = 6
    hidden_size: int = HIDDEN_SIZE
    heads: int = 8
    input_dim: int = INPUT_DIM
    output_dim: int = LATENT_DIM + 2

    @nn.compact
    def __call__(self, x):
        # x: [N, T, input_dim] (the reference's B=1 is dropped)
        x = nn.Dense(self.hidden_size, name="input_transform")(x)
        stride = self.time_depth // self.space_depth
        j = 0
        for i in range(self.time_depth):
            x = AttnBlockF(self.hidden_size, self.heads, name=f"time_{i}")(x)
            if i % stride == 0 and j < self.space_depth:
                xs = jnp.swapaxes(x, 0, 1)  # [T, N, C]
                xs = AttnBlockF(self.hidden_size, self.heads, name=f"space_{j}")(xs)
                x = jnp.swapaxes(xs, 0, 1)
                j += 1
        return nn.Dense(self.output_dim, name="flow_head")(x)


class CoTrackerModel(nn.Module):
    """fnet + updateformer + heads (cotracker.py:74-117)."""

    S: int = 8
    stride: int = 4

    def setup(self):
        self.fnet = BasicEncoderF(LATENT_DIM, self.stride)
        self.updateformer = UpdateFormerF()
        self.ffeat_updater = nn.Dense(LATENT_DIM, name="ffeat_updater")
        self.vis_predictor = nn.Dense(1, name="vis_predictor")
        # torch nn.GroupNorm(1, 128) (affine)
        self.delta_norm = nn.GroupNorm(
            num_groups=1, epsilon=1e-5, use_bias=True, use_scale=True,
            name="delta_norm",
        )

    def encode(self, frames):
        """frames [T, H, W, 3] in [0,255] -> fmaps [T, H/stride, W/stride, C]."""
        return self.fnet(2.0 * (frames / 255.0) - 1.0)

    def window(self, fmaps, coords_init, feat_init, vis_init, track_mask, iters):
        """One window of iterative refinement (forward_iteration,
        cotracker.py:118-223; B=1 dropped, all points processed).

        Args:
          fmaps: [S, H8, W8, C]; coords_init: [S, N, 2] (feature-map scale);
          feat_init: [S, N, C]; vis_init: [S, N, 1]; track_mask: [S, N, 1].

        Returns (coords [S, N, 2] at feature scale * stride, vis_logit [S, N]).
        """
        s, h8, w8, cdim = fmaps.shape
        n = coords_init.shape[1]

        # correlation pyramid of the frame features
        pyr = [fmaps]
        cur = fmaps
        for _ in range(CORR_LEVELS - 1):
            t, hh, ww, cc = cur.shape
            cur = (
                cur[:, : hh // 2 * 2, : ww // 2 * 2]
                .reshape(t, hh // 2, 2, ww // 2, 2, cc)
                .mean(axis=(2, 4))
            )
            pyr.append(cur)

        # positional embeddings
        pos_grid = sincos_pos_embed_2d(INPUT_DIM, h8, w8).reshape(h8, w8, INPUT_DIM)
        pos_embed = bilinear_clamped(
            pos_grid, coords_init[0, :, 0], coords_init[0, :, 1]
        )  # [N, 456]
        times_embed = sincos_pos_embed_1d(
            INPUT_DIM, jnp.arange(s, dtype=jnp.float32)
        )  # [S, 456]

        coords = coords_init
        ffeats = feat_init

        r = CORR_RADIUS
        dgrid = jnp.stack(
            jnp.meshgrid(
                jnp.arange(-r, r + 1, dtype=jnp.float32),
                jnp.arange(-r, r + 1, dtype=jnp.float32),
                indexing="ij",
            ),
            axis=-1,
        ).reshape(-1, 2)  # [(2r+1)^2, 2] as (dy, dx)

        k_taps = dgrid.shape[0]
        vis_logit = None
        for _ in range(iters):
            # corr pyramid sampled in a (2r+1)^2 window around each track
            # (CorrBlock.corr + .sample, blocks.py:270-325)
            fcorrs = []
            for lvl, fm in enumerate(pyr):
                _, hl, wl, _ = fm.shape
                corr = jnp.einsum("snc,shwc->snhw", ffeats, fm) / np.sqrt(cdim)
                cl = coords / (2.0 ** lvl)
                # reference quirk: CorrBlock.sample stacks delta as (dy, dx)
                # but adds it to (x, y) coords (blocks.py:296-306), i.e. the
                # 7x7 tap grid is TRANSPOSED vs the natural order — replicate
                # exactly (the learned weights depend on this ordering)
                xx = (cl[..., 0:1] + dgrid[None, None, :, 0]).reshape(s * n, k_taps)
                yy = (cl[..., 1:2] + dgrid[None, None, :, 1]).reshape(s * n, k_taps)
                # grid_sample zero padding (blocks.py:252-268)
                samp = jax.vmap(
                    lambda c, x, y: bilinear_sample(c, x, y, zero_pad=True)
                )(corr.reshape(s * n, hl, wl)[..., None], xx, yy)
                fcorrs.append(samp[..., 0].reshape(s, n, k_taps))
            fcorrs = jnp.concatenate(fcorrs, axis=-1)  # [S, N, L*K]

            flows = coords - coords[0:1]
            flows_nt = jnp.swapaxes(flows, 0, 1)  # [N, S, 2]
            flows_cat = embedding_2d_interleaved(flows_nt, 64)  # [N, S, 130]
            fcorrs_nt = jnp.swapaxes(fcorrs, 0, 1)  # [N, S, L*K]
            ffeats_nt = jnp.swapaxes(ffeats, 0, 1)  # [N, S, C]
            # reference quirk (cotracker.py:188-195): track_mask and vis are
            # concatenated along the POINT axis, permuted, then reshaped to
            # (N, S, 2) — which scrambles the two flag channels across frame
            # pairs and points. The released checkpoint was trained with this
            # exact layout, so replicate it rather than the "intended"
            # per-channel concat.
            concat = jnp.concatenate(
                [jnp.swapaxes(track_mask, 0, 1), jnp.swapaxes(vis_init, 0, 1)],
                axis=0,
            ).reshape(n, s, 2)

            x = jnp.concatenate([flows_cat, fcorrs_nt, ffeats_nt, concat], axis=-1)
            x = x + pos_embed[:, None, :] + times_embed[None]
            delta = self.updateformer(x)  # [N, S, 130]
            delta = jnp.swapaxes(delta, 0, 1)  # [S, N, 130]

            coords = coords + delta[..., :2]
            # ffeat_updater = GELU(exact)(Linear(GroupNorm(delta_feats)))
            # added to the running features (cotracker.py:105-110, 211-215)
            dfeat = delta[..., 2:].reshape(s * n, LATENT_DIM)
            dfeat = nn.gelu(
                self.ffeat_updater(self.delta_norm(dfeat)), approximate=False
            )
            ffeats = dfeat.reshape(s, n, LATENT_DIM) + ffeats

        vis_logit = self.vis_predictor(ffeats.reshape(s * n, LATENT_DIM)).reshape(
            s, n
        )
        return coords * float(self.stride), vis_logit

    def __call__(self, frames, queries, iters: int = 6):
        """Track: frames [T, H, W, 3] (0..255, already at model resolution),
        queries [N, 3] = (t, x, y) pixel coords at model resolution.

        Returns (traj [T, N, 2], vis_logit [T, N]); zero trajectory for
        frames before a query's first window (the backward-merge contract).
        """
        t_total = frames.shape[0]
        n = queries.shape[0]
        s = self.S
        fmaps_all = self.encode(frames)  # [T, H8, W8, C]
        h8, w8 = fmaps_all.shape[1], fmaps_all.shape[2]

        first = queries[:, 0]  # float frame indices
        coords_q = queries[:, 1:] / float(self.stride)  # [N, 2]

        # per-point appearance at the query location of the first frame
        fmap_at_first = jnp.clip(first.astype(jnp.int32), 0, t_total - 1)
        feat_q = jax.vmap(
            lambda ti, xy: bilinear_clamped(fmaps_all[ti], xy[0], xy[1])
        )(fmap_at_first, coords_q)  # [N, C]

        traj = jnp.zeros((t_total, n, 2), jnp.float32)
        vis = jnp.zeros((t_total, n), jnp.float32)

        prev_coords = None  # [S, N, 2] from previous window (feature scale)
        prev_vis = None

        half = s // 2
        window_starts = list(range(0, max(t_total - half, 1), half))
        for ind in window_starts:
            s_local = min(s, t_total - ind)
            idx = jnp.clip(jnp.arange(ind, ind + s), 0, t_total - 1)
            fmaps = fmaps_all[idx]  # [S, H8, W8, C] (tail frames repeat last)

            started_before = first < float(ind)  # carried from prev window
            active = first < float(ind + s)

            q_coords = jnp.broadcast_to(coords_q[None], (s, n, 2))
            if prev_coords is None:
                coords_init = q_coords
                vis_init = jnp.full((s, n, 1), 10.0)
            else:
                carried = jnp.concatenate(
                    [
                        prev_coords[half:],
                        jnp.broadcast_to(prev_coords[-1:], (half, n, 2)),
                    ],
                    axis=0,
                )
                coords_init = jnp.where(
                    started_before[None, :, None], carried, q_coords
                )
                carried_vis = jnp.concatenate(
                    [
                        prev_vis[half:],
                        jnp.broadcast_to(prev_vis[-1:], (half, n, 1)),
                    ],
                    axis=0,
                )
                vis_init = jnp.where(
                    started_before[None, :, None], carried_vis, 10.0
                )

            # track_mask (cotracker.py:252-258 + the running zeroing at :341):
            # frames not yet covered by a previous window AND >= first frame
            tgrid = jnp.arange(ind, ind + s, dtype=jnp.float32)[:, None]
            zeroed_upto = jnp.where(
                started_before & (ind > 0), float(ind + half), 0.0
            )
            track_mask = (
                (tgrid >= first[None, :]) & (tgrid >= zeroed_upto[None, :])
            ).astype(jnp.float32)[..., None]

            feat_init = jnp.broadcast_to(feat_q[None], (s, n, LATENT_DIM))

            coords_out, vis_out = self.window(
                fmaps, coords_init, feat_init, vis_init, track_mask, iters
            )

            upd = active[None, :]
            traj = traj.at[ind : ind + s_local].set(
                jnp.where(upd[..., None], coords_out[:s_local], traj[ind : ind + s_local])
            )
            vis = vis.at[ind : ind + s_local].set(
                jnp.where(upd, vis_out[:s_local], vis[ind : ind + s_local])
            )

            prev_coords = coords_out / float(self.stride)
            # carried vis_init stays a RAW logit (cotracker.py:316-320 carries
            # forward_iteration's vis_e without sigmoid; init value is 10)
            prev_vis = vis_out[..., None]

        return traj, vis


@dataclasses.dataclass(frozen=True)
class CoTrackerTracker:
    """pgdvs tracker-contract wrapper (same contract as LucasKanadeTracker).

    Mirrors CoTrackerPredictor._compute_sparse_tracks (predictor.py:96-165):
    resize to (384, 512), rescale queries, append a 6x6 support grid at t=0,
    track forward, merge a time-flipped backward pass into zero entries,
    threshold visibility at 0.9, rescale trajectories back.
    """

    params: dict
    S: int = 8
    stride: int = 4
    iters: int = 6
    interp_hw: tuple = (384, 512)
    support_grid: int = 6
    vis_thres: float = 0.9

    def __call__(self, frames, queries, query_valid=None):
        """frames [T, H, W, 3] in [0,1]; queries [N, 3] = (t, x, y).

        Returns tracks [N, T, 2] (clipped at 0 like the pgdvs interface),
        visibles [N, T] bool.
        """
        return _cotracker_track(
            self.params,
            frames,
            queries,
            self.S,
            self.stride,
            self.iters,
            self.interp_hw,
            self.support_grid,
            self.vis_thres,
        )


def _support_grid_points(grid_size: int, hw):
    """get_points_on_a_grid (cotracker.py:32-55), grid_center=(0,0)."""
    h, w = hw
    step = w // 64
    lin = np.arange(grid_size, dtype=np.float32)
    gy, gx = np.meshgrid(lin, lin, indexing="ij")
    gy = step + gy.reshape(-1) / float(grid_size - 1) * (h - step * 2)
    gx = step + gx.reshape(-1) / float(grid_size - 1) * (w - step * 2)
    return np.stack([gx, gy], axis=-1)  # [G*G, 2] as (x, y)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def _cotracker_track(
    params, frames, queries, s, stride, iters, interp_hw, support_grid, vis_thres
):
    t_total, h, w, _ = frames.shape
    hi, wi = interp_hw
    model = CoTrackerModel(S=s, stride=stride)

    frames_r = jax.vmap(lambda f: resize_bilinear(f, hi, wi, align_corners=False))(
        frames
    ) * 255.0

    n = queries.shape[0]
    scale = jnp.asarray([wi / w, hi / h], jnp.float32)
    q = jnp.concatenate([queries[:, :1], queries[:, 1:] * scale[None]], axis=1)

    sup = jnp.asarray(_support_grid_points(support_grid, interp_hw))
    sup_q = jnp.concatenate([jnp.zeros((sup.shape[0], 1)), sup], axis=1)
    q_all = jnp.concatenate([q, sup_q], axis=0)

    traj_f, vis_f = model.apply(params, frames_r, q_all, iters=iters)

    # backward pass on the time-flipped video (predictor.py:166-180).
    # NOTE: flip via gather, not [::-1]/jnp.flip — this environment's
    # XLA:CPU AlgebraicSimplifier crashes on HloReverse ("Invalid binary
    # instruction opcode map" in HandleReverse)
    flip_idx = jnp.arange(t_total - 1, -1, -1)
    inv_frames = jnp.take(frames_r, flip_idx, axis=0)
    inv_q = jnp.concatenate(
        [float(t_total) - 1.0 - q_all[:, :1], q_all[:, 1:]], axis=1
    )
    traj_b, vis_b = model.apply(params, inv_frames, inv_q, iters=iters)
    traj_b = jnp.take(traj_b, flip_idx, axis=0)
    vis_b = jnp.take(vis_b, flip_idx, axis=0)

    zero = traj_f == 0.0
    traj = jnp.where(zero, traj_b, traj_f)
    vis = jnp.where(zero[..., 0], vis_b, vis_f)

    traj = traj[:, :n]
    vis = vis[:, :n]

    visibles = jax.nn.sigmoid(vis) > vis_thres
    traj = traj * jnp.asarray([w / wi, h / hi], jnp.float32)
    traj = jnp.clip(traj, 0.0)  # pgdvs interface clips negatives

    return jnp.swapaxes(traj, 0, 1), jnp.swapaxes(visibles, 0, 1)

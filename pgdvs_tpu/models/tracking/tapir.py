"""TAPIR point tracker (Doersch et al., ICCV 2023) — flax port.

Architecture matches the deepmind/tapnet TAPIR the reference vendors
(``/root/reference/pgdvs/models/tapnet/tapir_model.py``) in the PGDVS
configuration (``interface.py:123-127``: pyramid_level=0, no depthwise-conv
interp, 256x256 working resolution):

  * ResNet-v2 backbone (instance norm, groups strides 1/2/2/1, channels
    64/128/256/256, 2 basic blocks each, projection everywhere, no maxpool)
    -> L2-normalized hires (stride 4, 128ch) + lowres (stride 8, 256ch)
    feature grids;
  * TAP-Net style initialization: query-feature/grid cost volume -> conv
    heads -> softmax heatmap soft-argmax (query frames reproduced verbatim)
    + occlusion / expected-distance logits;
  * 4 PIPs refinement iterations: 7x7 local correlation patches against
    both pyramid levels + a 12-block depthwise-conv MLP-Mixer predicting
    (dx, dy, docc, dexpd, dfeat) updates.

Weights: `load_tapir_checkpoint` ingests the released haiku checkpoint
(``tapir_checkpoint_panning.npy``); without it the tracker falls back to
random init (structurally valid; use the LK tracker for weight-free runs).

All shapes static: queries padded by the caller; batch dim dropped (the
PGDVS pipeline tracks one video at a time).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Sequence

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp

HIGHRES_DIM = 128
LOWRES_DIM = 256
INITIAL_RES = (256, 256)


def convert_grid_coords(coords, in_size, out_size):
    """Grid-size conversion: plain scale ``coords * out/in``.

    NOTE: the reference's transforms.convert_grid_coordinates DOCSTRING
    describes a half-pixel-aligned mapping ((x+.5)*scale-.5) but its CODE is
    a plain multiply (``transforms.py:79-81``) — the released checkpoint was
    trained with the plain scale, so match the code, not the docstring
    (verified by the haiku-oracle A/B: the docstring variant shifts tracks
    by stride/2 ≈ 3.5 px at the cost-volume stride).

    in_size/out_size are (w, h) or per-axis sequences matching coords[-1].
    """
    in_size = jnp.asarray(in_size, jnp.float32)
    out_size = jnp.asarray(out_size, jnp.float32)
    return coords * out_size / in_size


def interp_grid(grid, yx, mode: str = "nearest"):
    """Bilinear interpolation of [H, W, C] at [..., 2] (y, x) raster coords
    (raster: (0, 0) = corner of the top-left pixel, so sample at coord-0.5).
    """
    from pgdvs_tpu.core.interpolate import bilinear_sample

    x = yx[..., 1] - 0.5
    y = yx[..., 0] - 0.5
    if mode == "constant":
        return bilinear_sample(grid, x, y, zero_pad=True)
    # 'nearest' edge behavior == clamp
    return bilinear_sample(grid, x, y, zero_pad=False)


class TapirInstanceNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5)(x)


class TapirBlockV2(nn.Module):
    """Pre-activation basic residual block (resnet.py:156-266)."""

    channels: int
    stride: int = 1
    use_projection: bool = False

    @nn.compact
    def __call__(self, x):
        shortcut = x
        h = TapirInstanceNorm(name="instancenorm_0")(x)
        h = nn.relu(h)
        if self.use_projection:
            shortcut = nn.Conv(
                self.channels, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="shortcut_conv",
            )(h)
        h = nn.Conv(
            self.channels, (3, 3), strides=(self.stride, self.stride),
            use_bias=False, name="conv_0",
        )(h)
        h = TapirInstanceNorm(name="instancenorm_1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), use_bias=False, name="conv_1")(h)
        return h + shortcut


class TapirResNet(nn.Module):
    """Backbone; returns (hires stride-4 128ch, lowres stride-8 256ch)."""

    channels: Sequence[int] = (64, HIGHRES_DIM, 256, LOWRES_DIM)
    strides: Sequence[int] = (1, 2, 2, 1)
    blocks: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (7, 7), strides=(2, 2), use_bias=False, name="initial_conv")(x)
        outs = []
        for g, (ch, st, nb) in enumerate(zip(self.channels, self.strides, self.blocks)):
            for b in range(nb):
                h = TapirBlockV2(
                    ch,
                    stride=st if b == 0 else 1,
                    use_projection=b == 0,
                    name=f"group_{g}_block_{b}",
                )(h)
            outs.append(h)
        return outs[1], outs[3]  # hires, lowres


class PipsMixerBlock(nn.Module):
    """Depthwise temporal conv + channel MLP (tapir_model.py:37-122)."""

    kernel_shape: int = 3

    @nn.compact
    def __call__(self, x):
        # x: [N, T, C]
        c = x.shape[-1]
        skip = x
        h = nn.LayerNorm(use_bias=False, name="layer_norm")(x)
        # depthwise conv, channel multiplier 4
        h = nn.Conv(
            c * 4, (self.kernel_shape,), padding="SAME",
            feature_group_count=c, name="mlp1_up",
        )(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(
            c * 4, (self.kernel_shape,), padding="SAME",
            feature_group_count=c * 4, name="mlp1_up_1",
        )(h)
        # fold the multiplier back (tapir_model.py:85-86)
        h = h[..., 0::4] + h[..., 1::4] + h[..., 2::4] + h[..., 3::4]
        x = h + skip
        skip = x
        h = nn.LayerNorm(use_bias=False, name="layer_norm_1")(x)
        h = nn.Dense(c * 4, name="mlp2_up")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c, name="mlp2_down")(h)
        return h + skip


class PipsMlpMixer(nn.Module):
    output_channels: int
    hidden_dim: int = 512
    num_blocks: int = 12

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, name="linear")(x)
        for i in range(self.num_blocks):
            x = PipsMixerBlock(name=f"block_{i}")(x)
        x = nn.LayerNorm(use_bias=False, name="layer_norm")(x)
        return nn.Dense(self.output_channels, name="linear_1")(x)


def soft_argmax_heatmap(softmax_val, threshold: float = 5.0):
    """Soft argmax around the argmax cell (model_utils.py:99-138)."""
    h, w = softmax_val.shape
    x, y = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    coords = jnp.stack([x + 0.5, y + 0.5], axis=-1).astype(jnp.float32)
    argmax_pos = jnp.argmax(softmax_val.reshape(-1))
    pos = coords.reshape(-1, 2)[argmax_pos][None, None, :]
    valid = (
        jnp.sum((coords - pos) ** 2, axis=-1, keepdims=True) < threshold ** 2
    )
    wsum = jnp.sum(coords * valid * softmax_val[:, :, None], axis=(0, 1))
    norm = jnp.maximum(jnp.sum(valid * softmax_val[:, :, None], axis=(0, 1)), 1e-12)
    return wsum / norm


class Tapir(nn.Module):
    """Single-resolution TAPIR (B=1, video in [-1, 1], 256x256)."""

    num_pips_iter: int = 4
    patch_size: int = 7
    softmax_temperature: float = 20.0
    mixer_hidden_dim: int = 512
    num_mixer_blocks: int = 12

    def setup(self):
        self.resnet = TapirResNet(name="resnet")
        self.cost_hid1 = nn.Conv(16, (3, 3), name="cost_volume_regression_1")
        self.cost_hid2 = nn.Conv(1, (3, 3), name="cost_volume_regression_2")
        self.cost_hid3 = nn.Conv(
            32, (3, 3), strides=(2, 2), name="cost_volume_occlusion_1"
        )
        self.cost_hid4 = nn.Dense(16, name="cost_volume_occlusion_2")
        self.occ_out = nn.Dense(2, name="occlusion_out")
        self.mixer = PipsMlpMixer(
            4 + HIGHRES_DIM + LOWRES_DIM,
            hidden_dim=self.mixer_hidden_dim,
            num_blocks=self.num_mixer_blocks,
            name="pips_mlp_mixer",
        )

    def feature_grids(self, video):
        """video [T, H, W, 3] in [-1, 1] -> (hires [T,h4,w4,128],
        lowres [T,h8,w8,256]), both L2-normalized per position."""
        hires, lowres = self.resnet(video)

        def l2n(x):
            return x * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), 1e-12)
            )

        return l2n(hires), l2n(lowres)

    def query_features(self, grids, query_points, video_hw):
        """Bilinear query-feature extraction at (t, y, x) query points."""
        hires, lowres = grids
        t_idx = jnp.round(query_points[:, 0]).astype(jnp.int32)

        def extract(grid):
            gh, gw = grid.shape[1], grid.shape[2]
            yx = jnp.stack(
                [
                    convert_grid_coords(query_points[:, 1], (video_hw[0],), (gh,)),
                    convert_grid_coords(query_points[:, 2], (video_hw[1],), (gw,)),
                ],
                axis=-1,
            )
            per_point = jax.vmap(
                lambda t, p: interp_grid(grid[t], p[None] + 0.5, mode="nearest")[0]
            )
            # note: interp_grid subtracts the raster half-pixel internally
            return per_point(t_idx, yx)

        return extract(hires), extract(lowres)

    def tracks_from_cost_volume(self, query_feat, grid, query_points, video_hw):
        """TAP-Net initialization (tapir_model.py:345-411).

        query_feat [N, C]; grid [T, h, w, C]; query_points [N, 3] (t, y, x)
        in working-resolution raster coords.
        Returns points [N, T, 2] (x, y), occlusion [N, T], expected_dist [N, T].
        """
        t_n, gh, gw, _ = grid.shape
        n = query_feat.shape[0]
        cost = jnp.einsum("nc,thwc->tnhw", query_feat, grid)
        cv = cost.reshape(t_n * n, gh, gw, 1)

        occ = nn.relu(self.cost_hid1(cv))
        pos = self.cost_hid2(occ)  # [(tn), h, w, 1]
        pos = pos.reshape(t_n, n, gh, gw).transpose(1, 0, 2, 3)  # [n, t, h, w]
        flat = pos.reshape(n, t_n, -1) * self.softmax_temperature
        sm = jax.nn.softmax(flat, axis=-1).reshape(n, t_n, gh, gw)
        points = jax.vmap(jax.vmap(soft_argmax_heatmap, (0, None)), (0, None))(
            sm, 5.0
        )  # [n, t, 2] (x, y) in grid coords
        points = convert_grid_coords(
            points, (gw, gh), (video_hw[1], video_hw[0])
        )
        # reproduce query points verbatim on their own frames
        t_idx = jnp.round(
            convert_grid_coords(query_points[:, 0], (t_n,), (t_n,))
        ).astype(jnp.int32)
        frame_ids = jnp.arange(t_n)
        is_q = (t_idx[:, None] == frame_ids[None, :])[..., None]
        q_xy = query_points[:, 2:0:-1][:, None, :]
        points = jnp.where(is_q, q_xy, points)

        o = nn.relu(self.cost_hid3(occ))
        o = jnp.mean(o, axis=(1, 2))
        o = self.occ_out(nn.relu(self.cost_hid4(o)))  # [(tn), 2]
        o = o.reshape(t_n, n, 2)
        occlusion = o[..., 0].T  # [n, t]
        expected_dist = o[..., 1].T
        return points, occlusion, expected_dist

    def refine_pips(
        self,
        queries,  # (hires_q [N, 128], lowres_q [N, 256])
        pyramid,  # (hires [T,h,w,128], lowres [T,h,w,256])
        pos_guess,  # [N, T, 2] (x, y) working-res coords
        occ_guess,  # [N, T]
        expd_guess,  # [N, T]
        last_iter=None,  # [N, T, 384]
    ):
        """One PIPs iteration (tapir_model.py:413-557, pyramid_level=0)."""
        ps = self.patch_size
        half = ps // 2
        ctx = jnp.stack(
            jnp.meshgrid(
                jnp.arange(-half, half + 1), jnp.arange(-half, half + 1)
            ),
            axis=-1,
        ).reshape(-1, 2)  # [49, 2] (y, x) via meshgrid(ij? ) — symmetric window

        corrs = []
        for lvl, (query, grid) in enumerate(zip(queries, pyramid)):
            gh, gw = grid.shape[1], grid.shape[2]
            coords = jnp.stack(
                [
                    convert_grid_coords(
                        pos_guess[..., 1], (INITIAL_RES[0],), (gh,)
                    ),
                    convert_grid_coords(
                        pos_guess[..., 0], (INITIAL_RES[1],), (gw,)
                    ),
                ],
                axis=-1,
            )  # [N, T, 2] (y, x) grid coords
            coords2 = coords[:, :, None, :] + ctx[None, None, :, :]  # [N,T,49,2]

            if last_iter is None:
                q = query  # [N, C]
            else:
                q = (
                    last_iter[..., :HIGHRES_DIM]
                    if lvl == 0
                    else last_iter[..., HIGHRES_DIM:]
                )  # [N, T, C]

            def per_frame(grid_t, coords_t, q_t):
                # grid_t [h,w,C]; coords_t [N,49,2]; q_t [N,C]
                neigh = interp_grid(grid_t, coords_t, mode="constant")  # [N,49,C]
                return jnp.einsum("nsc,nc->ns", neigh, q_t)

            if last_iter is None:
                q_bt = jnp.broadcast_to(
                    q[:, None, :], (q.shape[0], grid.shape[0], q.shape[1])
                )
            else:
                q_bt = q
            patches = jax.vmap(per_frame, in_axes=(0, 1, 1), out_axes=1)(
                grid, coords2, q_bt
            )  # [N, T, 49]
            corrs.append(patches)
        corrs = jnp.concatenate(corrs, axis=-1)  # [N, T, 98]

        if last_iter is None:
            feats = jnp.concatenate(queries, axis=-1)  # [N, 384]
            feats = jnp.broadcast_to(
                feats[:, None, :], (feats.shape[0], corrs.shape[1], feats.shape[1])
            )
        else:
            feats = last_iter

        mlp_in = jnp.concatenate(
            [
                jnp.zeros_like(pos_guess),
                occ_guess[..., None],
                expd_guess[..., None],
                feats,
                corrs,
            ],
            axis=-1,
        )  # [N, T, 486]
        res = self.mixer(mlp_in)  # [N, T, 388]

        # position update: model works at the feature-grid resolution of the
        # refinement level == working resolution here
        pos_update = res[..., :2]
        return (
            pos_guess + pos_update,
            occ_guess + res[..., 2],
            expd_guess + res[..., 3],
            feats + res[..., 4:],
        )

    def __call__(self, video, query_points):
        """video [T, H, W, 3] in [-1, 1] (H, W == 256); query_points [N, 3]
        (t, y, x) raster coords at video resolution.

        Returns tracks [N, T, 2] (x, y), occlusion [N, T], expected_dist [N, T].
        """
        video_hw = video.shape[1:3]
        grids = self.feature_grids(video)
        q_hi, q_lo = self.query_features(grids, query_points, video_hw)

        points, occ, expd = self.tracks_from_cost_volume(
            q_lo, grids[1], query_points, video_hw
        )
        init_occ, init_expd = occ, expd

        mixer_feats = None
        for _ in range(self.num_pips_iter):
            points, occ, expd, mixer_feats = self.refine_pips(
                (q_hi, q_lo), grids, points, occ, expd, last_iter=mixer_feats
            )
        return points, occ, expd


# ---------------------------------------------------------------------------
# tracker-contract wrapper
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TapirTracker:
    """Tracker-contract wrapper: resize to 256x256, chunk-free single call,
    visibility = (1-sig(occ)) * (1-sig(expd)) > 0.5 (interface.py:150-179)."""

    params: dict
    model: Tapir
    keep_raw_res: bool = False

    def __call__(self, frames, queries, query_valid=None):
        t_n, h, w, _ = frames.shape
        rh, rw = (h, w) if self.keep_raw_res else INITIAL_RES
        video = jax.image.resize(frames, (t_n, rh, rw, 3), "bilinear") * 2.0 - 1.0
        # queries arrive as (t, x, y); TAPIR wants (t, y, x) at video res
        q = jnp.stack(
            [
                queries[:, 0],
                convert_grid_coords(queries[:, 2], (h,), (rh,)),
                convert_grid_coords(queries[:, 1], (w,), (rw,)),
            ],
            axis=-1,
        )
        tracks, occ, expd = self.model.apply(self.params, video, q)
        tracks = jnp.stack(
            [
                convert_grid_coords(tracks[..., 0], (rw,), (w,)),
                convert_grid_coords(tracks[..., 1], (rh,), (h,)),
            ],
            axis=-1,
        )
        visibles = (1 - jax.nn.sigmoid(occ)) * (1 - jax.nn.sigmoid(expd)) > 0.5
        if query_valid is not None:
            visibles = visibles & query_valid[:, None]
        return tracks, visibles


def init_tapir_params(key, n_frames: int = 4, n_queries: int = 8):
    model = Tapir()
    video = jnp.zeros((n_frames,) + INITIAL_RES + (3,))
    q = jnp.zeros((n_queries, 3))
    return model, model.init(key, video, q)


def load_tapir_checkpoint(path: Optional[str] = None):
    """Load + remap the released haiku TAPIR checkpoint.

    Returns flax params or None when the file is unavailable. The haiku
    checkpoint is a flat {module_path: {param_name: array}} dict; remapping
    is by path suffix. Unmatched keys raise with a full listing so checkpoint
    format drift is loud, not silent.
    """
    path = path or os.path.join(
        os.environ.get("PGDVS_CKPT_DIR", ""), "tapnet", "tapir_checkpoint_panning.npy"
    )
    if not os.path.isfile(path):
        return None
    ckpt = np.load(path, allow_pickle=True).item()
    if "params" in ckpt:
        ckpt = ckpt["params"]

    from pgdvs_tpu.models.tracking.tapir_port import remap_haiku_params

    return {"params": remap_haiku_params(ckpt)}


def make_tapir_tracker(keep_raw_res: bool = False, ckpt_path: Optional[str] = None):
    params = load_tapir_checkpoint(ckpt_path)
    model = Tapir()
    if params is None:
        import logging

        logging.getLogger(__name__).warning(
            "TAPIR checkpoint unavailable (set PGDVS_CKPT_DIR); using random "
            "weights — prefer the LK tracker for weight-free runs"
        )
        model, params = init_tapir_params(jax.random.PRNGKey(0))
    return TapirTracker(params=params, model=model, keep_raw_res=keep_raw_res)

"""Brute-force KNN mean distance + statistical outlier removal.

TPU-native replacement for pytorch3d ``knn_points`` as used by the reference
for Open3D-style statistical outlier removal
(``/root/reference/pgdvs/renderers/pgdvs_renderer_dyn.py:405-457``,
``st_geo_renderer.py:37-47``): for every point, the mean of its K nearest
**squared** distances (pytorch3d returns squared L2) is thresholded at
``median + std_thres * std`` over the cloud.

Design: the N x N distance matrix is never materialized. We scan over fixed
tiles of candidate points, keeping a running top-K smallest distance list per
query (concat + top_k) — O(N * tile) memory, MXU-friendly since the distance
computation is a matmul. Point validity is handled with masks so callers can
use fixed-capacity padded clouds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e30


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def knn_mean_sq_dist(points, valid=None, k: int = 50, tile: int = 2048):
    """Mean squared distance from each point to its K nearest valid neighbors.

    The query point itself is excluded (the reference asks for K+1 neighbors
    and drops the first).

    Args:
      points: [N, 3] (N is the padded capacity).
      valid: [N] bool; invalid points neither query nor serve as neighbors.
      k: neighbor count (render_cfg.dyn_pcl_outlier_knn).
      tile: candidate tile size (static; N is padded up to a multiple).

    Returns:
      mean_d2: [N] float32; garbage (big) at invalid rows.
    """
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    pts = jnp.where(valid[:, None], points, _BIG).astype(jnp.float32)

    n_pad = -(-n // tile) * tile
    pts_pad = jnp.pad(pts, ((0, n_pad - n), (0, 0)), constant_values=_BIG)
    sq_norm_pad = jnp.sum(pts_pad * pts_pad, axis=-1)

    q = pts  # queries stay un-padded: [N, 3]
    q_sq = jnp.sum(q * q, axis=-1)  # [N]

    def step(best, tile_idx):
        start = tile_idx * tile
        cand = jax.lax.dynamic_slice(pts_pad, (start, 0), (tile, 3))  # [T, 3]
        cand_sq = jax.lax.dynamic_slice(sq_norm_pad, (start,), (tile,))
        # squared L2 via the matmul identity; exact-f32 product
        cross = jnp.matmul(
            q, cand.T, precision=jax.lax.Precision.HIGHEST
        )  # [N, T]
        d2 = q_sq[:, None] - 2.0 * cross + cand_sq[None, :]
        d2 = jnp.maximum(d2, 0.0)
        # mask self-matches and padded/invalid candidates
        cand_ids = start + jnp.arange(tile)
        is_self = cand_ids[None, :] == jnp.arange(n)[:, None]
        is_pad = (cand_sq >= _BIG)[None, :]
        d2 = jnp.where(is_self | is_pad, _BIG, d2)
        # merge into running best-k (negate: top_k keeps largest)
        merged = jnp.concatenate([best, d2], axis=1)
        best_new, _ = jax.lax.top_k(-merged, k)
        return -best_new, None

    best0 = jnp.full((n, k), _BIG, jnp.float32)
    best, _ = jax.lax.scan(step, best0, jnp.arange(n_pad // tile))
    mean_d2 = jnp.mean(best, axis=1)
    return jnp.where(valid, mean_d2, _BIG)


def statistical_outlier_mask(points, valid=None, k: int = 50, std_thres: float = 0.1,
                             tile: int = 2048):
    """Open3D-style statistical outlier mask over a (padded) point cloud.

    Returns:
      keep: [N] bool — valid AND mean-KNN-sq-distance < median + thres * std.
      thres: scalar distance threshold (consumed by the track renderer's
        distance filters, ``pgdvs_renderer_dyn_track.py:296-338``).
    """
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    mean_d2 = knn_mean_sq_dist(points, valid, k=k, tile=tile)
    med = masked_median(mean_d2, valid)
    std = masked_std(mean_d2, valid)
    thres = med + std * std_thres
    keep = valid & (mean_d2 < thres)
    return keep, thres


def masked_median(x, valid):
    """Median over valid entries of a padded vector (invalid pushed to +inf).

    Matches torch.median (lower middle element) for even counts.
    """
    n = x.shape[0]
    cnt = jnp.sum(valid)
    sorted_x = jnp.sort(jnp.where(valid, x, jnp.inf))
    idx = jnp.clip((cnt - 1) // 2, 0, n - 1)
    return sorted_x[idx]


def masked_std(x, valid, eps: float = 0.0):
    """Unbiased (n-1) std over valid entries — matches torch.std."""
    cnt = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(jnp.where(valid, x, 0.0)) / cnt
    var = jnp.sum(jnp.where(valid, (x - mean) ** 2, 0.0)) / jnp.maximum(cnt - 1, 1)
    return jnp.sqrt(var + eps)

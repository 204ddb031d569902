"""Brute-force KNN mean distance + statistical outlier removal.

TPU-native replacement for pytorch3d ``knn_points`` as used by the reference
for Open3D-style statistical outlier removal
(``/root/reference/pgdvs/renderers/pgdvs_renderer_dyn.py:405-457``,
``st_geo_renderer.py:37-47``) and the track renderer's cross-cloud distance
filter (``pgdvs_renderer_dyn_track.py:296-338``): for every query point, the
mean of its K nearest **squared** distances (pytorch3d returns squared L2)
to a candidate cloud.

Design: the full distance matrix is never materialized. We scan over fixed
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


@functools.partial(jax.jit, static_argnames=("k", "tile", "exclude_self"))
def knn_mean_sq_dist(
    points,
    valid=None,
    k: int = 50,
    tile: int = 2048,
    candidates=None,
    cand_valid=None,
    exclude_self: bool = True,
):
    """Mean squared distance from each query to its K nearest candidates.

    Same-cloud mode (candidates=None): the query itself is excluded (the
    reference asks for K+1 neighbors and drops the first). Cross-cloud mode:
    all candidates count (the reference's track2base filter averages over
    all returned neighbors).

    Args:
      points: [N, 3] queries (padded capacity).
      valid: [N] bool; invalid rows get a big output.
      candidates: optional [M, 3] candidate cloud (default: points).
      cand_valid: [M] bool.
      k: neighbor count.
      tile: candidate tile size (static).

    Returns: mean_d2 [N] float32.
    """
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    same_set = candidates is None
    if same_set:
        candidates = points
        cand_valid = valid
        if exclude_self is False:
            raise ValueError("same-set knn always excludes self")
    elif cand_valid is None:
        cand_valid = jnp.ones((candidates.shape[0],), bool)

    q = jnp.where(valid[:, None], points, _BIG).astype(jnp.float32)
    c = jnp.where(cand_valid[:, None], candidates, _BIG).astype(jnp.float32)

    m = c.shape[0]
    m_pad = -(-m // tile) * tile
    c_pad = jnp.pad(c, ((0, m_pad - m), (0, 0)), constant_values=_BIG)
    c_sq_pad = jnp.sum(c_pad * c_pad, axis=-1)
    q_sq = jnp.sum(q * q, axis=-1)

    def step(best, tile_idx):
        start = tile_idx * tile
        cand = jax.lax.dynamic_slice(c_pad, (start, 0), (tile, 3))
        cand_sq = jax.lax.dynamic_slice(c_sq_pad, (start,), (tile,))
        cross = jnp.matmul(q, cand.T, precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.maximum(q_sq[:, None] - 2.0 * cross + cand_sq[None, :], 0.0)
        bad = (cand_sq >= _BIG)[None, :]
        if same_set:
            cand_ids = start + jnp.arange(tile)
            bad = bad | (cand_ids[None, :] == jnp.arange(n)[:, None])
        d2 = jnp.where(bad, _BIG, d2)
        merged = jnp.concatenate([best, d2], axis=1)
        best_new, _ = jax.lax.top_k(-merged, k)
        return -best_new, None

    best0 = jnp.full((n, k), _BIG, jnp.float32)
    best, _ = jax.lax.scan(step, best0, jnp.arange(m_pad // tile))
    mean_d2 = jnp.mean(best, axis=1)
    return jnp.where(valid, mean_d2, _BIG)


def statistical_outlier_mask(
    points,
    valid=None,
    k: int = 50,
    std_thres: float = 0.1,
    tile: int = 2048,
    dist_thres=None,
):
    """Open3D-style statistical outlier mask over a (padded) point cloud.

    Args:
      dist_thres: optional externally-supplied distance threshold (the track
        renderer reuses the base cloud's threshold,
        ``pgdvs_renderer_dyn_track.py:355-362``); default: median + thres*std
        over the cloud's own mean-KNN distances.

    Returns:
      keep: [N] bool — valid AND mean-KNN-sq-distance < threshold.
      thres: scalar distance threshold used.
    """
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    mean_d2 = knn_mean_sq_dist(points, valid, k=k, tile=tile)
    if dist_thres is None:
        med = masked_median(mean_d2, valid)
        std = masked_std(mean_d2, valid)
        thres = med + std * std_thres
    else:
        thres = dist_thres
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

"""Pyramidal Lucas-Kanade point tracking, pure jnp.

A classical, weight-free tracker filling the reference's tracker slot
(TAPIR/CoTracker dense tracking of dynamic-mask pixels across ±K frames,
``/root/reference/pgdvs/renderers/pgdvs_renderer_dyn_track.py:398-558``).

Design (all static shapes, fully vectorized over query points):
  * grayscale gaussian pyramid per frame (L levels, x2 downsampling);
  * per level, iterative LK: gather a fixed window around the current
    estimate, solve the 2x2 normal equations on image gradients;
  * queries live on different home frames; trajectories are chained
    frame-to-frame with two `lax.scan`s (forward and backward from each
    query's home), activating each query when the scan passes its home;
  * visibility = in-bounds AND windowed photometric error (vs. the home
    frame appearance) under threshold — the classical analogue of TAPIR's
    occlusion logit.

vmap over points, scan over frames, static window unroll: everything maps
onto the VPU; the gathers are the dominant cost.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from pgdvs_tpu.core.interpolate import bilinear_sample


def _to_gray(frames):
    return (
        0.299 * frames[..., 0] + 0.587 * frames[..., 1] + 0.114 * frames[..., 2]
    )


def _downsample2x(img):
    """2x2 average-pool downsample of [H, W]."""
    h, w = img.shape
    h2, w2 = h // 2, w // 2
    return img[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2).mean(axis=(1, 3))


def _window_offsets(radius: int):
    r = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(r, r, indexing="ij")
    return ox.reshape(-1), oy.reshape(-1)  # [(2r+1)^2]


def _sample_window(img, x, y, ox, oy):
    """img [H, W]; x,y [N]; returns [N, W2] window samples."""
    xs = x[:, None] + ox[None, :]
    ys = y[:, None] + oy[None, :]
    return bilinear_sample(img[..., None], xs, ys, zero_pad=False)[..., 0]


def _lk_refine(img_a, img_b, pos_a, pos_b, radius: int, iters: int):
    """Refine pos_b so that img_b(pos_b + w) matches img_a(pos_a + w).

    Classic inverse-additive LK on the window around pos_a in img_a.
    """
    ox, oy = _window_offsets(radius)
    patch_a = _sample_window(img_a, pos_a[:, 0], pos_a[:, 1], ox, oy)  # [N, W2]
    # spatial gradients of img_a at the template (central differences)
    gx = (
        _sample_window(img_a, pos_a[:, 0] + 0.5, pos_a[:, 1], ox, oy)
        - _sample_window(img_a, pos_a[:, 0] - 0.5, pos_a[:, 1], ox, oy)
    )
    gy = (
        _sample_window(img_a, pos_a[:, 0], pos_a[:, 1] + 0.5, ox, oy)
        - _sample_window(img_a, pos_a[:, 0], pos_a[:, 1] - 0.5, ox, oy)
    )
    gxx = jnp.sum(gx * gx, axis=1)
    gxy = jnp.sum(gx * gy, axis=1)
    gyy = jnp.sum(gy * gy, axis=1)
    det = gxx * gyy - gxy * gxy
    inv_ok = jnp.abs(det) > 1e-8
    det = jnp.where(inv_ok, det, 1.0)

    def body(_, pos):
        patch_b = _sample_window(img_b, pos[:, 0], pos[:, 1], ox, oy)
        diff = patch_b - patch_a
        bx = jnp.sum(diff * gx, axis=1)
        by = jnp.sum(diff * gy, axis=1)
        dx = (gyy * bx - gxy * by) / det
        dy = (gxx * by - gxy * bx) / det
        step = jnp.stack([dx, dy], axis=-1)
        step = jnp.clip(step, -radius * 2.0, radius * 2.0)
        return pos - jnp.where(inv_ok[:, None], step, 0.0)

    return jax.lax.fori_loop(0, iters, body, pos_b)


@dataclasses.dataclass(frozen=True)
class LucasKanadeTracker:
    """Chained pyramidal LK tracker with photometric visibility."""

    n_levels: int = 3
    radius: int = 4
    iters: int = 8
    vis_err_thres: float = 0.08  # mean-abs photometric error (gray, [0,1])
    query_chunk_size: int = 8192  # queries per sequential lax.map chunk:
    #                               bounds the [N, window^2] working set
    #                               (full-frame query counts — the faithful
    #                               track_queries_per_frame=0 default — OOM
    #                               HBM in one shot at eval resolution)

    def __call__(self, frames, queries, query_valid=None):
        """Track query points across all frames.

        Args:
          frames: [T, H, W, 3] in [0, 1].
          queries: [N, 3] (home_frame_t, x, y).
          query_valid: [N] bool (padded queries).

        Returns:
          tracks: [N, T, 2] float (x, y);
          visibles: [N, T] bool.
        """
        n = queries.shape[0]
        valid = (
            jnp.ones(n, bool) if query_valid is None else query_valid
        )
        cs = self.query_chunk_size
        args = (
            self.n_levels,
            self.radius,
            self.iters,
            self.vis_err_thres,
        )
        if n <= cs:
            return _lk_track(frames, queries, valid, *args)
        n_pad = -(-n // cs) * cs
        q = jnp.pad(queries, ((0, n_pad - n), (0, 0)))
        qv = jnp.pad(valid, (0, n_pad - n))
        tracks, vis = jax.lax.map(
            lambda ab: _lk_track(frames, ab[0], ab[1], *args),
            (q.reshape(-1, cs, 3), qv.reshape(-1, cs)),
        )
        t_n = frames.shape[0]
        return (
            tracks.reshape(n_pad, t_n, 2)[:n],
            vis.reshape(n_pad, t_n)[:n],
        )


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _lk_track(frames, queries, query_valid, n_levels, radius, iters, vis_thres):
    t_n, h, w, _ = frames.shape
    gray = _to_gray(frames)  # [T, H, W]

    # pyramids: list of [T, H/2^l, W/2^l]
    pyr = [gray]
    for _ in range(n_levels - 1):
        pyr.append(jax.vmap(_downsample2x)(pyr[-1]))

    home = queries[:, 0].astype(jnp.int32)
    home_xy = queries[:, 1:3].astype(jnp.float32)

    def step_pair(src_t, dst_t, pos):
        """One frame-to-frame LK chain step at full pyramid."""
        cur = pos
        for lvl in reversed(range(n_levels)):
            s = 2.0 ** lvl
            cur = (
                _lk_refine(
                    pyr[lvl][src_t],
                    pyr[lvl][dst_t],
                    pos / s,
                    cur / s,
                    radius,
                    iters,
                )
                * s
            )
        return cur

    # forward chain: t -> t+1
    def fwd_body(pos, t):
        new_pos = step_pair(t, t + 1, pos)
        active = home <= t
        starts = home == t + 1
        pos_next = jnp.where(
            starts[:, None], home_xy, jnp.where(active[:, None], new_pos, pos)
        )
        return pos_next, pos_next

    init = jnp.where((home == 0)[:, None], home_xy, jnp.zeros_like(home_xy))
    _, fwd = jax.lax.scan(fwd_body, init, jnp.arange(t_n - 1))
    # fwd[i] = positions at frame i+1

    def bwd_body(pos, t):
        # t runs T-1 .. 1; chain t -> t-1
        new_pos = step_pair(t, t - 1, pos)
        active = home >= t
        starts = home == t - 1
        pos_next = jnp.where(
            starts[:, None], home_xy, jnp.where(active[:, None], new_pos, pos)
        )
        return pos_next, pos_next

    init_b = jnp.where((home == t_n - 1)[:, None], home_xy, jnp.zeros_like(home_xy))
    _, bwd = jax.lax.scan(bwd_body, init_b, jnp.arange(t_n - 1, 0, -1))
    # bwd[i] = positions at frame (T-2-i)

    # assemble: frame t takes fwd result when t > home, bwd when t < home,
    # exact query position when t == home
    frame_ids = jnp.arange(t_n)

    def pick(t):
        fwd_pos = jnp.where((t >= 1), fwd[jnp.clip(t - 1, 0, t_n - 2)], home_xy)
        bwd_pos = jnp.where(
            (t <= t_n - 2), jnp.flip(bwd, axis=0)[jnp.clip(t, 0, t_n - 2)], home_xy
        )
        pos = jnp.where(
            (t == home)[:, None],
            home_xy,
            jnp.where((t > home)[:, None], fwd_pos, bwd_pos),
        )
        return pos

    tracks = jax.vmap(pick)(frame_ids)  # [T, N, 2]

    # visibility: in-bounds + windowed photometric agreement with the home
    # frame appearance
    ox, oy = _window_offsets(radius)

    home_patch = jax.vmap(
        lambda t, xy: _sample_window(gray[t], xy[0:1], xy[1:2], ox, oy)[0]
    )(home, home_xy)  # [N, W2]

    def vis_at(t):
        pos = tracks[t]
        patch = _sample_window(gray[t], pos[:, 0], pos[:, 1], ox, oy)
        err = jnp.mean(jnp.abs(patch - home_patch), axis=1)
        inb = (
            (pos[:, 0] >= 0)
            & (pos[:, 0] <= w - 1)
            & (pos[:, 1] >= 0)
            & (pos[:, 1] <= h - 1)
        )
        return inb & (err < vis_thres)

    visibles = jax.vmap(vis_at)(frame_ids)  # [T, N]
    visibles = visibles & query_valid[None, :]
    # home frame is visible by construction
    visibles = visibles | ((frame_ids[:, None] == home[None, :]) & query_valid[None, :])

    return jnp.swapaxes(tracks, 0, 1), jnp.swapaxes(visibles, 0, 1)

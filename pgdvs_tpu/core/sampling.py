"""Along-ray sample placement.

Stratified uniform / inverse-depth sampling and inverse-CDF (PDF) importance
sampling. Functional equivalents of
``/root/reference/pgdvs/models/gnt/ray_sampler.py`` with XLA-friendly
vectorized CDF inversion (searchsorted instead of a python loop over bins)
and explicit PRNG keys instead of global torch RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_z_vals(near, far, n_samples: int, inv_uniform: bool):
    """Deterministic z placement between per-ray near/far.

    Args:
      near, far: [n_rays] positive depths.
      n_samples: static sample count.
      inv_uniform: if True, samples are uniform in 1/z (disparity).

    Returns: [n_rays, n_samples] increasing z values.
    """
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)  # [S]
    if inv_uniform:
        start = 1.0 / near
        end = 1.0 / far
        inv_z = start[:, None] + (end - start)[:, None] * t[None, :]
        return 1.0 / inv_z
    return near[:, None] + (far - near)[:, None] * t[None, :]


def stratify_z_vals(z_vals, key):
    """Jitter deterministic z values uniformly within their bins."""
    mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
    upper = jnp.concatenate([mids, z_vals[:, -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[:, :1], mids], axis=-1)
    t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * t_rand


def sample_along_rays(
    rays_o,
    rays_d,
    depth_range,
    n_samples: int,
    inv_uniform: bool = False,
    deterministic: bool = True,
    key=None,
):
    """Place points along rays.

    Args:
      rays_o, rays_d: [n_rays, 3].
      depth_range: [n_rays, 2] per-ray (near, far).
      n_samples: static int.
      deterministic: if False, stratified-jitter with `key`.

    Returns:
      pts: [n_rays, n_samples, 3], z_vals: [n_rays, n_samples].
    """
    z_vals = sample_z_vals(depth_range[:, 0], depth_range[:, 1], n_samples, inv_uniform)
    if not deterministic:
        z_vals = stratify_z_vals(z_vals, key)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    return pts, z_vals


def sample_pdf(bins, weights, n_samples: int, deterministic: bool = True, key=None):
    """Inverse-CDF sampling of ``n_samples`` positions from per-bin weights.

    Vectorized (searchsorted) counterpart of the reference's python-loop CDF
    inversion (``ray_sampler.py:10-56``), numerically matched: weights get
    +1e-5, degenerate CDF spans fall back to the bin start.

    Args:
      bins: [n_rays, M+1] bin edges.
      weights: [n_rays, M] non-negative weights.

    Returns: [n_rays, n_samples] samples.
    """
    n_rays, m = weights.shape
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # [n, M+1]

    if deterministic:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=bins.dtype)
        u = jnp.broadcast_to(u, (n_rays, n_samples))
    else:
        u = jax.random.uniform(key, (n_rays, n_samples), dtype=bins.dtype)

    # reference semantics: above = #cdf-starts <= u over cdf[:, :M], which is
    # exactly searchsorted(..., side='right'); below = above - 1 clamped to 0
    above = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(
        cdf[:, :m], u
    )
    below = jnp.maximum(above - 1, 0)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def sample_fine_z_vals(
    z_vals,
    weights,
    n_importance: int,
    inv_uniform: bool,
    deterministic: bool = True,
    key=None,
):
    """Importance-resample fine z values and merge-sort with the coarse ones.

    Mirrors ``ray_sampler.py:183-220``: in inv_uniform mode the PDF is built
    over flipped inverse-depth midpoints (so bins increase), with the first
    and last coarse weights dropped.

    Returns: [n_rays, n_coarse + n_importance] sorted z values.
    """
    if inv_uniform:
        inv_z = 1.0 / z_vals
        inv_mid = 0.5 * (inv_z[:, 1:] + inv_z[:, :-1])
        w = weights[:, 1:-1]
        inv_fine = sample_pdf(
            jnp.flip(inv_mid, axis=1),
            jnp.flip(w, axis=1),
            n_importance,
            deterministic=deterministic,
            key=key,
        )
        z_fine = 1.0 / inv_fine
    else:
        z_mid = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
        w = weights[:, 1:-1]
        z_fine = sample_pdf(z_mid, w, n_importance, deterministic=deterministic, key=key)
    return jnp.sort(jnp.concatenate([z_vals, z_fine], axis=-1), axis=-1)

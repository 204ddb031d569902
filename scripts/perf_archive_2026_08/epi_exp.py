"""Bisect the epipolar-sampling tile cost on TPU."""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from pgdvs_tpu.core import cameras, sampling
from pgdvs_tpu.core.interpolate import bilinear_sample
from pgdvs_tpu.data.synthetic import make_contract_data

H, W, V, S, TILE = 288, 550, 10, 256, 2048

data = make_contract_data(h=H, w=W, n_spatial=V, n_frames=12)
dev = {k: jnp.asarray(v) for k, v in data.items() if not isinstance(v, (dict, str))}
tgt_cam = dev["flat_cam_tgt"]
src_cams = dev["flat_cam_src_spatial"]
src_rgbs = dev["static_rgb_src_spatial"].astype(jnp.bfloat16)
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.normal(size=(V, H // 4, W // 4, 32)).astype(np.float32)).astype(jnp.bfloat16)

rays_o, rays_d, _, _ = cameras.get_rays(
    H, W, cameras.flat_cam_intrinsics(tgt_cam), cameras.flat_cam_c2w(tgt_cam)
)
o = rays_o[:TILE]
d = rays_d[:TILE]
dr = jnp.broadcast_to(dev["depth_range"], (TILE, 2))


def timeit(name, fn, *a, iters=5):
    out = jax.block_until_ready(fn(*a))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / iters * 1e3
    print(json.dumps({"exp": name, "ms_per_tile": round(ms, 2),
                      "s_per_image_77tiles": round(ms * 77 / 1e3, 2)}), flush=True)


def sample_only(o, d, dr):
    pts, z = sampling.sample_along_rays(o, d, dr, S, inv_uniform=True)
    return jnp.sum(pts) + jnp.sum(z)


def plus_project(o, d, dr):
    pts, _ = sampling.sample_along_rays(o, d, dr, S, inv_uniform=True)
    uv, z, front = jax.vmap(lambda c: cameras.project_points(pts, c))(src_cams)
    return jnp.sum(uv) + jnp.sum(z)


def plus_rgb(o, d, dr):
    pts, _ = sampling.sample_along_rays(o, d, dr, S, inv_uniform=True)

    def per_view(cam, rgb):
        uv, z, front = cameras.project_points(pts, cam)
        return jnp.sum(bilinear_sample(rgb, uv[..., 0], uv[..., 1]))

    return jnp.sum(jax.vmap(per_view)(src_cams, src_rgbs))


def plus_feat(o, d, dr):
    pts, _ = sampling.sample_along_rays(o, d, dr, S, inv_uniform=True)

    def per_view(cam, feat):
        uv, z, front = cameras.project_points(pts, cam)
        sx = (W // 4 - 1.0) / (W - 1.0)
        sy = (H // 4 - 1.0) / (H - 1.0)
        return jnp.sum(bilinear_sample(feat, uv[..., 0] * sx, uv[..., 1] * sy))

    return jnp.sum(jax.vmap(per_view)(src_cams, feats))


def plus_raydiff(o, d, dr):
    pts, _ = sampling.sample_along_rays(o, d, dr, S, inv_uniform=True)
    tgt_c2w = cameras.flat_cam_c2w(tgt_cam)

    def per_view(cam):
        return jnp.sum(
            cameras.ray_diff_features(pts, tgt_c2w, cameras.flat_cam_c2w(cam))
        )

    return jnp.sum(jax.vmap(per_view)(src_cams))


def full(o, d, dr):
    from pgdvs_tpu.models.gnt.projector import epipolar_sample

    pts, _ = sampling.sample_along_rays(o, d, dr, S, inv_uniform=True)
    pr = epipolar_sample(pts, tgt_cam, src_cams, src_rgbs, feats)
    return sum(jnp.sum(v) for v in pr.values())


timeit("sample_only", jax.jit(sample_only), o, d, dr)
timeit("plus_project", jax.jit(plus_project), o, d, dr)
timeit("plus_rgb", jax.jit(plus_rgb), o, d, dr)
timeit("plus_feat", jax.jit(plus_feat), o, d, dr)
timeit("plus_raydiff", jax.jit(plus_raydiff), o, d, dr)
timeit("full_epipolar", jax.jit(full), o, d, dr)

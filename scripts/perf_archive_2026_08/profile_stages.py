"""Stage-by-stage TPU timing of the render pipeline at benchmark scale.

Times (per 288x550 novel view, 10 source views, 256 samples):
  1. ResUNet feature extraction (10 views)
  2. epipolar projection + bilinear sampling (per ray tile, full image)
  3. GNT transformer (per ray tile, full image)
  4. dynamic branch (softsplat path)
Prints one JSON line per stage.
"""

import json
import os
import pathlib
import sys
import time

# NOTE: use sys.path, not PYTHONPATH — this environment's TPU plugin fails to
# register when PYTHONPATH is set
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from pgdvs_tpu.core import cameras, sampling
from pgdvs_tpu.data.synthetic import make_contract_data
from pgdvs_tpu.models.gnt.projector import epipolar_sample
from pgdvs_tpu.renderers.config import RenderConfig
from pgdvs_tpu.renderers.dynamic import render_dynamic
from pgdvs_tpu.renderers.static_gnt import init_gnt_params, make_gnt_models

H, W, V, S = 288, 550, 10, 256
TILE = int(os.environ.get("PROF_TILE", "2048"))


def _force(out):
    """This environment's tunneled TPU does not sync on block_until_ready;
    force execution by fetching a scalar."""
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0].astype(jnp.float32).reshape(-1)[:16]))


def timeit(name, fn, *args, iters=2):
    _force(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        _force(fn(*args))
    dt = (time.time() - t0) / iters
    print(json.dumps({"stage": name, "seconds": round(dt, 4)}), flush=True)
    return dt


def main():
    cfg = RenderConfig(n_coarse_samples_per_ray=S, ray_tile=TILE)
    data = make_contract_data(h=H, w=W, n_spatial=V, n_frames=12)
    dev = {k: jnp.asarray(v) for k, v in data.items() if not isinstance(v, (dict, str))}
    models = make_gnt_models()
    feature_net, gnt = models
    params = jax.jit(lambda k: init_gnt_params(k, *models, n_src=V))(
        jax.random.PRNGKey(0)
    )
    params = jax.block_until_ready(params)

    src_rgbs = dev["static_rgb_src_spatial"]

    # 1. feature net
    feat_fn = jax.jit(lambda p, x: feature_net.apply(p, x))
    t_feat = timeit("feature_net_10views", feat_fn, params["feature_net"], src_rgbs)
    feats = feat_fn(params["feature_net"], src_rgbs)

    # rays
    tgt_cam = dev["flat_cam_tgt"]
    rays_o, rays_d, _uv, (rh, rw) = cameras.get_rays(
        H, W, cameras.flat_cam_intrinsics(tgt_cam), cameras.flat_cam_c2w(tgt_cam)
    )
    n_rays = rh * rw
    n_tiles = -(-n_rays // TILE)
    rays_o_t = jnp.pad(rays_o, ((0, n_tiles * TILE - n_rays), (0, 0)), mode="edge")
    rays_d_t = jnp.pad(rays_d, ((0, n_tiles * TILE - n_rays), (0, 0)), mode="edge")
    dr = jnp.broadcast_to(dev["depth_range"], (n_tiles * TILE, 2))
    o3 = rays_o_t.reshape(n_tiles, TILE, 3)
    d3 = rays_d_t.reshape(n_tiles, TILE, 3)
    r3 = dr.reshape(n_tiles, TILE, 2)

    # 2. projection+sampling only, whole image via lax.map
    def proj_tile(args):
        o, d, r = args
        pts, z = sampling.sample_along_rays(o, d, r, S, inv_uniform=True)
        pr = epipolar_sample(
            pts, tgt_cam, dev["flat_cam_src_spatial"], src_rgbs, feats
        )
        # reduce to keep outputs small
        return {k: jnp.sum(v) for k, v in pr.items()}

    proj_fn = jax.jit(lambda o, d, r: jax.lax.map(proj_tile, (o, d, r)))
    timeit("epipolar_sampling_full_image", proj_fn, o3, d3, r3)

    # 3. transformer only on random pre-sampled features
    rng = np.random.default_rng(0)
    rf = jnp.asarray(rng.normal(size=(TILE, S, V, 35)).astype(np.float32))
    rd = jnp.asarray(rng.normal(size=(TILE, S, V, 4)).astype(np.float32))
    mk = jnp.ones((TILE, S, V, 1))
    pts1 = jnp.asarray(rng.normal(size=(TILE, S, 3)).astype(np.float32))
    rdir = jnp.asarray(rng.normal(size=(TILE, 3)).astype(np.float32))

    def gnt_fn(rf, rd, mk, pts1, rdir):
        def gnt_tile(_):
            out = gnt.apply(params["gnt"], rf, rd, mk, pts1, rdir)
            return jnp.sum(out["rgb"]) + jnp.sum(out["weights"])

        return jax.lax.map(gnt_tile, jnp.arange(n_tiles))

    timeit(
        "gnt_transformer_full_image",
        jax.jit(gnt_fn),
        rf, rd, mk, pts1, rdir,
    )

    # 4. dynamic branch
    dyn_fn = jax.jit(
        lambda d, k: render_dynamic(d, cfg, k)["rgb"]
    )
    timeit("dynamic_branch", dyn_fn, dev, jax.random.PRNGKey(0))


if __name__ == "__main__":
    main()

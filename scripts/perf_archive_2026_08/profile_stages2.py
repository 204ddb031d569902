"""Stage timing of the CURRENT render pipeline at benchmark scale."""
import json, os, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from pgdvs_tpu.core import cameras, sampling
from pgdvs_tpu.data.synthetic import make_contract_data
from pgdvs_tpu.models.gnt.projector import build_quad_maps, epipolar_sample_fused
from pgdvs_tpu.renderers.config import RenderConfig
from pgdvs_tpu.renderers.dynamic import render_dynamic
from pgdvs_tpu.renderers.static_gnt import init_gnt_params, make_gnt_models, render_image_gnt

H, W, V, S = 288, 550, 10, 256
TILE = 4096

def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32).reshape(-1)[:16]))

def timeit(name, fn, *args, iters=2):
    t0 = time.time(); force(fn(*args)); c = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        force(fn(*args))
    print(json.dumps({"stage": name, "s": round((time.time()-t0)/iters, 3),
                      "compile_s": round(c, 1)}), flush=True)

cfg = RenderConfig(
    n_coarse_samples_per_ray=S, ray_tile=TILE,
    epipolar_mode=os.environ.get("PROF_EPI_MODE", "quad"),
    pallas_kernel=os.environ.get("PROF_KERNEL", "mono3"),
    pallas_fold_ray_diff=os.environ.get("PROF_FOLD", "1") == "1",
)
data = make_contract_data(h=H, w=W, n_spatial=V, n_frames=12)
dev = {k: jnp.asarray(v) for k, v in data.items() if not isinstance(v, (dict, str))}
models = make_gnt_models()
feature_net, gnt = models
with jax.default_device(jax.devices("cpu")[0]):
    params = init_gnt_params(jax.random.PRNGKey(0), *models, n_src=V)
params = jax.device_put(params, jax.devices()[0])
src_rgbs = dev["static_rgb_src_spatial"]

feat_fn = jax.jit(lambda p, x: feature_net.apply(p, x))
timeit("feature_net", feat_fn, params["feature_net"], src_rgbs)
feats = feat_fn(params["feature_net"], src_rgbs)

qmap_fn = jax.jit(lambda r, f: build_quad_maps(r, f, None, dtype=jnp.bfloat16))
timeit("build_quad_maps", qmap_fn, src_rgbs, feats)
qmaps = qmap_fn(src_rgbs, feats)

tgt_cam = dev["flat_cam_tgt"]
rays_o, rays_d, _uv, (rh, rw) = cameras.get_rays(
    H, W, cameras.flat_cam_intrinsics(tgt_cam), cameras.flat_cam_c2w(tgt_cam))
n_rays = rh * rw
n_tiles = -(-n_rays // TILE)
pad = n_tiles * TILE - n_rays
o3 = jnp.pad(rays_o, ((0, pad), (0, 0)), mode="edge").reshape(n_tiles, TILE, 3)
d3 = jnp.pad(rays_d, ((0, pad), (0, 0)), mode="edge").reshape(n_tiles, TILE, 3)
r3 = jnp.broadcast_to(dev["depth_range"], (n_tiles * TILE, 2)).reshape(n_tiles, TILE, 2)

def quad_sample_image(qm, o, d, r, with_rd=True):
    def quad_tile(args):
        o, d, r = args
        pts, z = sampling.sample_along_rays(o, d, r, S, inv_uniform=True)
        pr = epipolar_sample_fused(pts, tgt_cam, dev["flat_cam_src_spatial"],
                                   qm, with_mask=False, quad=True,
                                   views_outer=True, with_ray_diff=with_rd)
        return {k: jnp.sum(v.astype(jnp.float32))
                for k, v in pr.items() if v is not None}
    return jax.lax.map(quad_tile, (o, d, r))

def sample_only_image(o, d, r):
    def tile(args):
        o, d, r = args
        pts, z = sampling.sample_along_rays(o, d, r, S, inv_uniform=True)
        return jnp.sum(pts) + jnp.sum(z)
    return jax.lax.map(tile, (o, d, r))

timeit("sample_along_rays_only", jax.jit(sample_only_image), o3, d3, r3)
timeit("quad_sampling_full_image", jax.jit(quad_sample_image), qmaps, o3, d3, r3)
timeit("quad_sampling_no_ray_diff",
       jax.jit(lambda qm, o, d, r: quad_sample_image(qm, o, d, r, False)),
       qmaps, o3, d3, r3)

dyn_fn = jax.jit(lambda d, k: render_dynamic(d, cfg, k)["rgb"])
timeit("dynamic_branch", dyn_fn, dev, jax.random.PRNGKey(0))

full = jax.jit(lambda p, d, k: render_image_gnt(
    models, p, d["flat_cam_tgt"], d["flat_cam_src_spatial"],
    d["static_rgb_src_spatial"], (H, W), d["depth_range"], cfg))
timeit("static_gnt_full", full, params, dev, 0)

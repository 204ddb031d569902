"""Split the quad-sampling stage: gather vs projection vs ray_diff."""
import json, os, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import numpy as np, jax, jax.numpy as jnp
from pgdvs_tpu.core import cameras, sampling
from pgdvs_tpu.models.gnt.projector import quad_bilinear, project_all_views

H, W, V, S, TILE = 288, 550, 10, 256, 4096
TILES = 39
rng = np.random.default_rng(0)
qmaps = jnp.asarray(rng.normal(size=(V, H, W, 144)).astype(np.float32), jnp.bfloat16)
cams = []
k4 = np.eye(4); k4[0,0]=k4[1,1]=500.; k4[0,2],k4[1,2]=W/2,H/2
for i in range(V):
    c2w = np.eye(4); c2w[:3,3]=[0.1*i,0,0]
    cams.append(np.asarray(cameras.make_flat_cam(H, W, k4, c2w), np.float32))
cams = jnp.asarray(np.stack(cams))
tgt = cams[0]
o = jnp.zeros((TILE,3)); d = jnp.asarray(np.tile([0,0,1.],(TILE,1)).astype(np.float32))
dr = jnp.asarray(np.tile([1.,6.],(TILE,1)).astype(np.float32))

def force(x): return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32).reshape(-1)[:8]))
def timeit(name, fn, *a, iters=3):
    t0=time.time(); force(fn(*a)); c=time.time()-t0
    t0=time.time()
    for _ in range(iters): force(fn(*a))
    dt=(time.time()-t0)/iters
    print(json.dumps({"stage": name, "s_tile": round(dt,3), "s_image": round(dt*TILES,2), "compile_s": round(c,1)}), flush=True)

def proj_only(o, d, dr):
    pts, z = sampling.sample_along_rays(o, d, dr, S, inv_uniform=True)
    uv, zz, inf = project_all_views(pts, cams)
    return jnp.sum(uv.astype(jnp.float32))
timeit("project_only", jax.jit(proj_only), o, d, dr)

def gather_only(qm, o, d, dr):
    pts, z = sampling.sample_along_rays(o, d, dr, S, inv_uniform=True)
    uv, zz, inf = project_all_views(pts, cams)
    smp = quad_bilinear(qm, uv[..., 0], uv[..., 1])
    return jnp.sum(smp.astype(jnp.float32))
timeit("project_plus_gather", jax.jit(gather_only), qmaps, o, d, dr)

def ray_diff_only(o, d, dr):
    pts, z = sampling.sample_along_rays(o, d, dr, S, inv_uniform=True)
    tgt_c2w = cameras.flat_cam_c2w(tgt)
    diff = jax.vmap(lambda cam: cameras.ray_diff_features(pts, tgt_c2w, cameras.flat_cam_c2w(cam)))(cams)
    return jnp.sum(diff.astype(jnp.float32))
timeit("ray_diff_only", jax.jit(ray_diff_only), o, d, dr)

import sys, pathlib, os, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import numpy as np, jax, jax.numpy as jnp
from pgdvs_tpu.models.gnt.projector import build_fused_maps, epipolar_sample_fused, multiview_bilinear
from pgdvs_tpu.core import cameras, sampling

H, W, V, S, TILE = 288, 550, 10, 256, 2048
rng = np.random.default_rng(0)
rgbs = jnp.asarray(rng.uniform(0,1,(V,H,W,3)).astype(np.float32))
feats = jnp.asarray(rng.normal(size=(V,H//4,W//4,32)).astype(np.float32))
masks = jnp.asarray((rng.uniform(size=(V,H,W,1))>0.8).astype(np.float32))

def step(name, fn, *a):
    try:
        out = fn(*a)
        v = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).reshape(-1)[:8]))
        print(json.dumps({"step": name, "ok": True}), flush=True)
        return out
    except Exception as e:
        print(json.dumps({"step": name, "error": str(e)[:200]}), flush=True)
        raise SystemExit(1)

maps = step("build_fused_maps", jax.jit(lambda r, f, m: build_fused_maps(r, f, m, dtype=jnp.bfloat16)), rgbs, feats, masks)

x = jnp.asarray(rng.uniform(-5, W+5, (V, TILE, S)).astype(np.float32))
y = jnp.asarray(rng.uniform(-5, H+5, (V, TILE, S)).astype(np.float32))
step("multiview_bilinear_36ch", jax.jit(lambda m, a, b: jnp.sum(multiview_bilinear(m, a, b))), maps, x, y)

k4 = np.eye(4); k4[0,0]=k4[1,1]=440.; k4[0,2]=W/2; k4[1,2]=H/2
cams = jnp.asarray(np.stack([np.asarray(cameras.make_flat_cam(H, W, k4, np.eye(4)), np.float32)]*V))
pts = jnp.asarray(rng.normal(size=(TILE,S,3)).astype(np.float32))
pts = pts.at[..., 2].set(jnp.abs(pts[...,2])+2.)
step("epipolar_sample_fused_tile", jax.jit(lambda p: {k: jnp.sum(v) for k, v in epipolar_sample_fused(p, cams[0], cams, maps, True).items()}), pts)
print("all ok")

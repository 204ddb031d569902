import sys, pathlib, os, json, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import numpy as np, jax, jax.numpy as jnp
from pgdvs_tpu.kernels.gnt_fused import gnt_fused_apply
from pgdvs_tpu.models.gnt.network import GNT, sinusoidal_embed

rng = np.random.default_rng(0)
r, s, v, f = 2048, 256, 10, 32
gnt = GNT(netwidth=64, depth=8, in_feat_ch=f, dtype="bfloat16", ret_view_std=False)
rf_small = jnp.asarray(rng.normal(size=(8, 8, v, 3+f)).astype(np.float32))
rd_small = jnp.asarray(rng.normal(size=(8, 8, v, 4)).astype(np.float32))
mk_small = jnp.ones((8, 8, v, 1))
pts_small = jnp.asarray(rng.normal(size=(8, 8, 3)).astype(np.float32))
dir_small = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
params = gnt.init(jax.random.PRNGKey(0), rf_small, rd_small, mk_small, pts_small, dir_small)

# correctness on TPU (small)
ref = gnt.apply(params, rf_small, rd_small, mk_small, pts_small, dir_small)
out = gnt_fused_apply(params, rf_small, rd_small, mk_small,
                      sinusoidal_embed(pts_small),
                      sinusoidal_embed(dir_small/jnp.linalg.norm(dir_small,axis=-1,keepdims=True)),
                      ray_block=8)
err = float(jnp.max(jnp.abs(out["rgb"] - ref["rgb"])))
werr = float(jnp.max(jnp.abs(out["weights"] - ref["weights"])))
print(json.dumps({"rgb_max_err": err, "w_max_err": werr}), flush=True)

# throughput at benchmark tile scale
rf = jnp.asarray(rng.normal(size=(r, s, v, 3+f)).astype(np.float32)).astype(jnp.bfloat16)
rd = jnp.asarray(rng.normal(size=(r, s, v, 4)).astype(np.float32)).astype(jnp.bfloat16)
mk = jnp.ones((r, s, v, 1))
ptsc = jnp.asarray(rng.normal(size=(r, s, 63)).astype(np.float32)).astype(jnp.bfloat16)
dirc = jnp.asarray(rng.normal(size=(r, 63)).astype(np.float32)).astype(jnp.bfloat16)

fn = jax.jit(lambda *a: gnt_fused_apply(params, *a, ray_block=8))
_ = float(jnp.sum(fn(rf, rd, mk, ptsc, dirc)["rgb"]))
t0 = time.time()
iters = 3
for _i in range(iters):
    _ = float(jnp.sum(fn(rf, rd, mk, ptsc, dirc)["rgb"]))
ms = (time.time()-t0)/iters*1e3
print(json.dumps({"fused_ms_per_tile": round(ms,1), "s_per_image_77tiles": round(ms*77/1e3,2)}), flush=True)

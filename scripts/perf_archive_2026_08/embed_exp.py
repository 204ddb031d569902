"""Cost of sinusoidal embeddings + count reductions (single tile x39)."""
import json, os, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import numpy as np, jax, jax.numpy as jnp
from pgdvs_tpu.models.gnt.network import sinusoidal_embed

R, S, V, TILES = 4096, 256, 10, 39
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.normal(size=(R, S, 3)).astype(np.float32))
mask = jnp.asarray(rng.uniform(size=(V, R, S)).astype(np.float32))
w = jnp.asarray(rng.uniform(size=(R, S)).astype(np.float32))

def force(x): return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:8]))
def timeit(name, fn, *a, iters=4):
    t0=time.time(); force(fn(*a)); c=time.time()-t0
    t0=time.time()
    for _ in range(iters): force(fn(*a))
    dt=(time.time()-t0)/iters
    print(json.dumps({"stage": name, "s_tile": round(dt,4),
                      "s_image": round(dt*TILES,2), "compile_s": round(c,1)}), flush=True)

def rep(fn, x, n=8):
    # amortize dispatch: run 8x inside the jit
    def body(c, _):
        return c, jnp.sum(fn(x + c).astype(jnp.float32))
    _, outs = jax.lax.scan(body, 0.0, jnp.arange(n))
    return outs

timeit("pts_code_tile_x8", jax.jit(lambda p: rep(sinusoidal_embed, p)), pts)
timeit("counts_tile_x8", jax.jit(lambda m: rep(lambda mm: jnp.sum(w * jnp.sum(mm, axis=0) / V, axis=-1), m)), mask)

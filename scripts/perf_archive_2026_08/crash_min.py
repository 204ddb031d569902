import sys, pathlib, os, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import numpy as np, jax, jax.numpy as jnp
from pgdvs_tpu.models.gnt.projector import multiview_bilinear

H, W, V, S, TILE = 288, 550, 10, 256, 1024
C = int(sys.argv[1]); NTILES = int(sys.argv[2])
rng = np.random.default_rng(0)
maps = jnp.asarray(rng.normal(size=(V, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
xs = jnp.asarray(rng.uniform(-5, W+5, (NTILES, V, TILE, S)).astype(np.float32))
ys = jnp.asarray(rng.uniform(-5, H+5, (NTILES, V, TILE, S)).astype(np.float32))

def tile(args):
    x, y = args
    return jnp.sum(multiview_bilinear(maps, x, y).astype(jnp.float32))

out = jax.jit(lambda xs, ys: jax.lax.map(tile, (xs, ys)))(xs, ys)
print(json.dumps({"C": C, "ntiles": NTILES, "sum": float(jnp.sum(out))}))

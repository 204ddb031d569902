"""Bisect the mono2 kernel cost: ablate ray / view / softmax stages."""
import json, os, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import numpy as np
import jax, jax.numpy as jnp

R, S, V, F = 4096, 256, 10, 35
RB = int(os.environ.get("KEXP_RB", "4"))
ABL = os.environ.get("KEXP_ABL", "")
N_TILES = 39  # 288x550 image at tile 4096

from pgdvs_tpu.renderers.static_gnt import make_gnt_models, init_gnt_params
from pgdvs_tpu.kernels.gnt_fused_mono2 import gnt_fused_apply_mono2

models = make_gnt_models()
with jax.default_device(jax.devices("cpu")[0]):
    params = init_gnt_params(jax.random.PRNGKey(0), *models, n_src=V)
gp = jax.device_put(params["gnt"], jax.devices()[0])

rng = np.random.default_rng(0)
rf = jnp.asarray(rng.normal(size=(V, R, S, F)).astype(np.float32), jnp.bfloat16)
rd = jnp.asarray(rng.normal(size=(V, R, S, 4)).astype(np.float32), jnp.bfloat16)
mk = jnp.ones((V, R, S, 1), jnp.bfloat16)
pts_code = jnp.asarray(rng.normal(size=(R, S, 63)).astype(np.float32))
view_code = jnp.asarray(rng.normal(size=(R, 63)).astype(np.float32))

def run():
    out = gnt_fused_apply_mono2(gp, rf, rd, mk, pts_code, view_code,
                                ray_block=RB, views_outer=True, ablate=ABL)
    return float(jnp.sum(out["rgb"])) + float(jnp.sum(out["weights"]))

t0 = time.time(); run(); compile_s = time.time() - t0
t0 = time.time()
for _ in range(3):
    run()
per_tile = (time.time() - t0) / 3
print(json.dumps({"exp": f"bisect_abl={ABL or 'full'}_rb{RB}",
                  "compile_s": round(compile_s, 1),
                  "ms_per_tile": round(per_tile * 1e3, 1),
                  "s_per_image": round(per_tile * N_TILES, 2)}), flush=True)

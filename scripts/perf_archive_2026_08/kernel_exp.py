"""On-device timing: fused GNT kernel alone + quad gather alone at bench shapes."""
import json, os, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import numpy as np
import jax, jax.numpy as jnp

R = int(os.environ.get("KEXP_R", "2048"))
S = int(os.environ.get("KEXP_S", "256"))
V = int(os.environ.get("KEXP_V", "10"))
F = 35
RB = int(os.environ.get("KEXP_RB", "8"))
N_TILES = 77  # per-image scale

from pgdvs_tpu.renderers.static_gnt import make_gnt_models, init_gnt_params
KIMPL = os.environ.get("KEXP_IMPL", "split")
if KIMPL == "mono":
    from pgdvs_tpu.kernels.gnt_fused_mono import gnt_fused_apply_mono as gnt_fused_apply
elif KIMPL == "mono2":
    from pgdvs_tpu.kernels.gnt_fused_mono2 import gnt_fused_apply_mono2 as gnt_fused_apply
elif KIMPL == "mono3":
    from pgdvs_tpu.kernels.gnt_fused_mono3 import gnt_fused_apply_mono3 as gnt_fused_apply
else:
    from pgdvs_tpu.kernels.gnt_fused import gnt_fused_apply
from pgdvs_tpu.models.gnt.network import sinusoidal_embed

import time as _t
_t0 = _t.time()
models = make_gnt_models()
with jax.default_device(jax.devices("cpu")[0]):
    params = init_gnt_params(jax.random.PRNGKey(0), *models, n_src=V)
gp = jax.device_put(params["gnt"], jax.devices()[0])
print(json.dumps({"stage": "init_params", "s": round(_t.time()-_t0,1)}), flush=True)

rng = np.random.default_rng(0)
rf = jnp.asarray(rng.normal(size=(V, R, S, F)).astype(np.float32), jnp.bfloat16)
rd = jnp.asarray(rng.normal(size=(V, R, S, 4)).astype(np.float32), jnp.bfloat16)
mk = jnp.ones((V, R, S, 1), jnp.bfloat16)
pts_code = jnp.asarray(rng.normal(size=(R, S, 63)).astype(np.float32))
view_code = jnp.asarray(rng.normal(size=(R, 63)).astype(np.float32))

def run(i):
    out = gnt_fused_apply(gp, rf, rd, mk, pts_code, view_code,
                          ray_block=RB, views_outer=True)
    return float(jnp.sum(out["rgb"])) + float(jnp.sum(out["weights"]))

t0 = time.time(); _ = run(0); compile_s = time.time() - t0
t0 = time.time()
for i in range(3):
    _ = run(i)
per_tile = (time.time() - t0) / 3
print(json.dumps({"exp": f"kernel_{KIMPL}_rb{RB}_v{V}_s{S}", "compile_s": round(compile_s,1),
                  "ms_per_tile": round(per_tile*1e3,1),
                  "s_per_image": round(per_tile*N_TILES,2)}), flush=True)

"""On-device timing of the mono4 (128-lane packed) kernel vs mono3.

Same per-tile protocol as kernel_exp.py; mono4's fold-set signature needs
pts + cameras, synthesized here at bench-like scales.
"""
import json, os, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import numpy as np
import jax, jax.numpy as jnp

R = int(os.environ.get("KEXP_R", "4096"))
S = int(os.environ.get("KEXP_S", "256"))
V = int(os.environ.get("KEXP_V", "10"))
F = 35
RB = int(os.environ.get("KEXP_RB", "4"))
H, W = 288, 550
N_TILES = 39  # ceil(158400 / 4096): per-image scale

from pgdvs_tpu.renderers.static_gnt import make_gnt_models, init_gnt_params
from pgdvs_tpu.core import cameras as cam_mod
from pgdvs_tpu.models.gnt.network import sinusoidal_embed

KIMPL = os.environ.get("KEXP_IMPL", "mono4")

models = make_gnt_models()
with jax.default_device(jax.devices("cpu")[0]):
    params = init_gnt_params(jax.random.PRNGKey(0), *models, n_src=V)
gp = jax.device_put(params["gnt"], jax.devices()[0])

rng = np.random.default_rng(0)
rf = jnp.asarray(rng.normal(size=(V, R, S, F)).astype(np.float32), jnp.bfloat16)
pts = jnp.asarray(rng.normal(0, 1.2, (R, S, 3)).astype(np.float32) + [0, 0, 2.5])
k = np.eye(4); k[0, 0] = k[1, 1] = 250.0; k[0, 2], k[1, 2] = W / 2, H / 2
cams = []
for i in range(V + 1):
    c2w = np.eye(4); c2w[:3, 3] = [0.2 * i - 0.3, 0.1 * i, -0.2 * i]
    cams.append(np.asarray(cam_mod.make_flat_cam(H, W, k, c2w), np.float32))
cams = jnp.asarray(np.stack(cams))
projs = jax.vmap(cam_mod.flat_cam_projection)(cams[1:])
centers = jax.vmap(cam_mod.flat_cam_c2w)(cams)[:, :3, 3]
ray_d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
vc = sinusoidal_embed(ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True))

PKV = os.environ.get("KEXP_PKV", "1") == "1"
ABL = os.environ.get("KEXP_ABLATE", "")

if KIMPL == "mono4":
    from pgdvs_tpu.kernels.gnt_fused_mono4 import gnt_fused_apply_mono4

    def run(i):
        out = gnt_fused_apply_mono4(
            gp, rf, pts, vc, centers, projs, (float(H), float(W)),
            ray_block=RB, precompute_kv=PKV, ablate=ABL,
        )
        return float(jnp.sum(out["rgb"])) + float(jnp.sum(out["weights"]))
else:
    from pgdvs_tpu.kernels.gnt_fused_mono3 import gnt_fused_apply_mono3

    def run(i):
        out = gnt_fused_apply_mono3(
            gp, rf, None, None, None, vc, ray_block=RB, views_outer=True,
            pts=pts, cam_centers=centers, fold_pos_code=True,
            fold_mask_hw=(float(H), float(W)), proj_mats=projs,
        )
        return float(jnp.sum(out["rgb"])) + float(jnp.sum(out["weights"]))

t0 = time.time(); _ = run(0); compile_s = time.time() - t0
t0 = time.time()
for i in range(3):
    _ = run(i)
per_tile = (time.time() - t0) / 3
# pkv/abl only affect mono4 — tagging them on mono3 baselines would label
# runs with options that had no effect (ADVICE r3)
opt_tag = f"_pkv{int(PKV)}_abl{ABL or 'none'}" if KIMPL == "mono4" else ""
print(json.dumps({"exp": f"kernel_{KIMPL}_rb{RB}_v{V}_s{S}_r{R}{opt_tag}",
                  "compile_s": round(compile_s, 1),
                  "ms_per_tile": round(per_tile * 1e3, 1),
                  "s_per_image": round(per_tile * N_TILES, 2)}), flush=True)

import sys, pathlib, os, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import numpy as np, jax, jax.numpy as jnp
from pgdvs_tpu.data.synthetic import make_contract_data
from pgdvs_tpu.renderers.config import RenderConfig
from pgdvs_tpu.renderers.static_gnt import make_gnt_models, init_gnt_params, render_image_gnt
from pgdvs_tpu.renderers.dynamic import render_dynamic

H, W, V = 288, 550, 10
which = sys.argv[1]
data = make_contract_data(h=H, w=W, n_spatial=V, n_frames=12)
dev = {k: jnp.asarray(v) for k, v in data.items() if not isinstance(v, (dict, str))}
models = make_gnt_models()
params = jax.jit(lambda k: init_gnt_params(k, *models, n_src=V))(jax.random.PRNGKey(0))

if which == "dyn":
    cfg = RenderConfig()
    out = jax.jit(lambda d, k: render_dynamic(d, cfg, k)["rgb"])(dev, jax.random.PRNGKey(0))
else:
    cfg = RenderConfig(epipolar_mode=("fused" if which == "fused" else "exact"), ray_tile=1024)
    out = jax.jit(lambda p: render_image_gnt(
        models, p, dev["flat_cam_tgt"], dev["flat_cam_src_spatial"],
        dev["static_rgb_src_spatial"], (H, W), dev["depth_range"], cfg)["rgb"]
    )(params)
print(json.dumps({"which": which, "sum": float(jnp.sum(out.astype(jnp.float32)))}))

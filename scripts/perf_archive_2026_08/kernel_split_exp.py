"""Time view-kernel and ray-kernel separately (scan of 8 inside one jit)."""
import json, os, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import numpy as np
import jax, jax.numpy as jnp

R, S, V = 2048, 256, 10
RB = int(os.environ.get("KEXP_RB", "8"))
RBR = int(os.environ.get("KEXP_RBR", "32"))
REPS = 8

from pgdvs_tpu.kernels import gnt_fused as gf

rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(R, S, 64)).astype(np.float32), jnp.bfloat16)
h = jnp.asarray(rng.normal(size=(V, R, S, 64)).astype(np.float32), jnp.bfloat16)
rd = jnp.asarray(rng.normal(size=(V, R, S, 4)).astype(np.float32), jnp.bfloat16)
bias = jnp.zeros((V, R, S, 1), jnp.float32)
vw = [jnp.asarray(rng.normal(size=s_).astype(np.float32), jnp.bfloat16) for s_ in
      [(64,),(64,),(64,64),(64,64),(64,64),(4,8),(8,),(8,64),(64,),(64,8),(8,),(8,64),(64,),(64,64),(64,),(64,),(64,),(64,256),(256,),(256,64),(64,)]]
rw = [jnp.asarray(rng.normal(size=s_).astype(np.float32), jnp.bfloat16) for s_ in
      [(64,),(64,),(64,64),(64,64),(64,64),(64,64),(64,),(64,),(64,),(64,256),(256,),(256,64),(64,)]]

bias16 = bias.astype(jnp.bfloat16)
@jax.jit
def view8(q, h, rd, bias, *vw):
    def body(qc, _):
        return gf._run_view(qc, h, rd, bias, list(vw), RB, False), 0
    out, _ = jax.lax.scan(body, q, jnp.arange(REPS))
    return out

@jax.jit
def ray8(q, *rw):
    def body(qc, _):
        qo, w = gf._run_ray(qc, list(rw), RBR, False, blockdiag=os.environ.get('KEXP_BD','0')=='1')
        return qo, jnp.sum(w)
    out, _ = jax.lax.scan(body, q, jnp.arange(REPS))
    return out

def timeit(name, fn, *a):
    t0 = time.time(); val = float(jnp.sum(fn(*a).astype(jnp.float32))); c = time.time()-t0
    t0 = time.time()
    for _ in range(3):
        val = float(jnp.sum(fn(*a).astype(jnp.float32)))
    dt = (time.time()-t0)/3
    print(json.dumps({"exp": name, "compile_s": round(c,1),
                      "ms_per_call": round(dt/REPS*1e3,2),
                      "s_image_8blocks": round(dt*77,2)}), flush=True)

timeit(f"view_rb{RB}", view8, q, h, rd, bias16, *vw)
timeit(f"ray_rb{RBR}_bd{os.environ.get('KEXP_BD','0')}", ray8, q, *rw)

"""Micro Pallas kernels: raw matmul rates at the GNT kernel's shapes."""
import json, os, pathlib, sys, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CASE = os.environ.get("MXU_CASE", "big")
STEPS = int(os.environ.get("MXU_STEPS", "1024"))
REP = int(os.environ.get("MXU_REP", "8"))  # matmuls per grid step

shapes = {
    "big":    (1024, 512, 512),   # clearly MXU-friendly
    "gnt_nv": (10240, 64, 64),    # the view-side projection shape
    "gnt_ns": (1024, 64, 256),    # the FF fc1 shape
    "narrow": (10240, 64, 8),     # the attn bottleneck shape
}
M, K, N = shapes[CASE]

def kernel(x_ref, w_ref, o_ref):
    x = x_ref[:]
    acc = None
    for i in range(REP):
        y = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
        # chain to defeat CSE: feed a cheap transform of y's slice back
        acc = y if acc is None else acc + y
        x = x + acc[:, :K].astype(x.dtype) * 1e-6 if acc.shape[1] >= K else x
    o_ref[:] = acc[0:8, 0:128]

@functools.partial(jax.jit, static_argnames=())
def run(x, w):
    return pl.pallas_call(
        kernel,
        grid=(STEPS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )(x, w)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
t0 = time.time(); float(jnp.sum(run(x, w))); comp = time.time() - t0
t0 = time.time()
for _ in range(3):
    float(jnp.sum(run(x, w)))
dt = (time.time() - t0) / 3
flops = 2.0 * M * K * N * REP * STEPS
print(json.dumps({"case": CASE, "mkn": [M, K, N], "compile_s": round(comp, 1),
                  "s": round(dt, 3),
                  "tflops": round(flops / dt / 1e12, 1),
                  "us_per_matmul": round(dt / (STEPS * REP) * 1e6, 2)}))

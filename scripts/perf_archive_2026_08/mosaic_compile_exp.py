"""Which kernel construct makes Mosaic compiles pathological? Time each."""
import json, os, pathlib, sys, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NS, NV, NW, V = 2048, 20480, 64, 10
rng = np.random.default_rng(0)
x_nv = jnp.asarray(rng.normal(size=(NV, NW)).astype(np.float32), jnp.bfloat16)
x_ns = jnp.asarray(rng.normal(size=(NS, NW)).astype(np.float32), jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(NW, NW)).astype(np.float32), jnp.bfloat16)

def timeit(name, fn, *a):
    t0 = time.time()
    try:
        out = fn(*a)
        val = float(jnp.sum(out.astype(jnp.float32)))
    except Exception as e:
        print(json.dumps({"exp": name, "error": str(e)[:200]}), flush=True)
        return
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        val = float(jnp.sum(fn(*a).astype(jnp.float32)))
    print(json.dumps({"exp": name, "compile_s": round(compile_s, 1),
                      "run_ms": round((time.time()-t0)/3*1e3, 2)}), flush=True)

def pall(kern, out_shape, n_in):
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )

# 1. tall matmul [NV, 64] @ [64, 64]
def k_tall(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
timeit("tall_matmul_nv", jax.jit(lambda x, w: pall(k_tall, jax.ShapeDtypeStruct((NV, NW), jnp.bfloat16), 2)(x, w)), x_nv, w)

# 2. ns matmul [NS, 64] @ [64, 64]
timeit("matmul_ns", jax.jit(lambda x, w: pall(k_tall, jax.ShapeDtypeStruct((NS, NW), jnp.bfloat16), 2)(x, w)), x_ns, w)

# 3. vtile concat x10
def k_tile(x_ref, o_ref):
    o_ref[:] = jnp.concatenate([x_ref[:]] * V, axis=0)
timeit("vtile_concat10", jax.jit(lambda x: pall(k_tile, jax.ShapeDtypeStruct((NV, NW), jnp.bfloat16), 1)(x)), x_ns)

# 4. vsum of 10 slices
def k_vsum(x_ref, o_ref):
    x = x_ref[:]
    out = x[0:NS]
    for i in range(1, V):
        out = out + x[i*NS:(i+1)*NS]
    o_ref[:] = out
timeit("vsum_slices10", jax.jit(lambda x: pall(k_vsum, jax.ShapeDtypeStruct((NS, NW), jnp.bfloat16), 1)(x)), x_nv)

# 5. exp over [NV, 64] f32
def k_exp(x_ref, o_ref):
    o_ref[:] = jnp.exp(x_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
timeit("exp_nv", jax.jit(lambda x: pall(k_exp, jax.ShapeDtypeStruct((NV, NW), jnp.bfloat16), 1)(x)), x_nv)

# 6. ray attention one head [8, 256, 256]
RB, S, HD = 8, 256, 16
q3 = jnp.asarray(rng.normal(size=(RB, S, HD)).astype(np.float32), jnp.bfloat16)
def k_attn(q_ref, o_ref):
    q = q_ref[:]
    lg = jax.lax.dot_general(q, q, dimension_numbers=(((2,),(2,)),((0,),(0,))), preferred_element_type=jnp.float32)
    lg = lg - jnp.max(lg, axis=-1, keepdims=True)
    ex = jnp.exp(lg)
    at = (ex / jnp.sum(ex, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot_general(at, q, dimension_numbers=(((2,),(1,)),((0,),(0,))), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
timeit("ray_attn_head", jax.jit(lambda q: pall(k_attn, jax.ShapeDtypeStruct((RB, S, HD), jnp.bfloat16), 1)(q)), q3)

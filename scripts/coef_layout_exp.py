"""On-chip micro-benchmark: patch-coef fusion output layouts.

The [v, b, 4, s, 16] bf16 coef build costs 7.6 ms/tile (0.59 s/view) —
suspicion: the 16-lane minor dim pads to 128 in T(8,128)(2,1), an 8x
write-bandwidth tax. Variants:
  a) [v,b,4,s,16] bf16 (current)
  b) [v,b,4,s,16] f32
  c) [v,b,4,s*16]  bf16 (merged minor — unpadded lanes)
  d) [v,b,4,16,s]  bf16 (s-minor — unpadded, but kernel would transpose)
Usage: python scripts/coef_layout_exp.py
"""
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

V, B, S = 10, 512, 256


def inputs(key):
    ks = jax.random.split(key, 6)
    shape = (V, B, 4, S)
    wy0, wy1, wx0, wx1 = (
        jax.random.uniform(k, shape, jnp.float32) for k in ks[:4]
    )
    dy = jnp.floor(jax.random.uniform(ks[4], shape, jnp.float32) * 3)
    dx = jnp.floor(jax.random.uniform(ks[5], shape, jnp.float32) * 3)
    return wy0, wy1, wx0, wx1, dy, dx


PI = jnp.asarray(np.arange(16) // 4, jnp.float32)
PJ = jnp.asarray(np.arange(16) % 4, jnp.float32)


def coef_a(wy0, wy1, wx0, wx1, dy, dx):
    cy = wy0[..., None] * (dy[..., None] == PI) + wy1[..., None] * (
        dy[..., None] == PI - 1.0
    )
    cx = wx0[..., None] * (dx[..., None] == PJ) + wx1[..., None] * (
        dx[..., None] == PJ - 1.0
    )
    return (cy * cx).astype(jnp.bfloat16)


def coef_b(*a):
    return coef_a(*a).astype(jnp.float32)


def coef_c(*a):
    return coef_a(*a).reshape(V, B, 4, S * 16)


def coef_d(wy0, wy1, wx0, wx1, dy, dx):
    cy = wy0[..., None, :] * (dy[..., None, :] == PI[:, None]) + wy1[
        ..., None, :
    ] * (dy[..., None, :] == PI[:, None] - 1.0)
    cx = wx0[..., None, :] * (dx[..., None, :] == PJ[:, None]) + wx1[
        ..., None, :
    ] * (dx[..., None, :] == PJ[:, None] - 1.0)
    return (cy * cx).astype(jnp.bfloat16)


def main():
    args = inputs(jax.random.PRNGKey(0))
    # RPC overhead
    f0 = jax.jit(lambda x: x + 1.0)
    x0 = jnp.ones((8,))
    float(jnp.sum(f0(x0)))
    t0 = time.time()
    for _ in range(10):
        float(jnp.sum(f0(x0)))
    ovh = (time.time() - t0) / 10

    out = {"rpc_ms": round(ovh * 1e3, 1)}
    for name, fn in (("a_s16_bf16", coef_a), ("b_s16_f32", coef_b),
                     ("c_merged_bf16", coef_c), ("d_smin_bf16", coef_d)):
        def g_fn(*a, fn=fn):
            y = jax.lax.optimization_barrier(fn(*a))  # force materialization
            return jnp.sum(y[..., ::64].astype(jnp.float32))

        g = jax.jit(g_fn)
        float(g(*args))
        reps = 8
        t0 = time.time()
        for _ in range(reps):
            float(g(*args))
        ms = (time.time() - t0) / reps * 1e3 - ovh * 1e3
        out[name + "_ms"] = round(ms, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

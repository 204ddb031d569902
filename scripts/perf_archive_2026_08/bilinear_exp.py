"""Isolate the real bilinear_sample cost vs raw-take equivalents."""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

from pgdvs_tpu.core.interpolate import bilinear_sample, _bilinear_sample_taps

H, W, V = 288, 550, 10
R, S = 2048, 256
rng = np.random.default_rng(0)
rgbs = jnp.asarray(rng.normal(size=(V, H, W, 3)).astype(np.float32)).astype(jnp.bfloat16)
feats = jnp.asarray(
    rng.normal(size=(V, H // 4, W // 4, 32)).astype(np.float32)
).astype(jnp.bfloat16)
x = jnp.asarray(rng.uniform(-5, W + 5, (V, R, S)).astype(np.float32))
y = jnp.asarray(rng.uniform(-5, H + 5, (V, R, S)).astype(np.float32))
xin = jnp.asarray(rng.uniform(0, W - 1, (V, R, S)).astype(np.float32))
yin = jnp.asarray(rng.uniform(0, H - 1, (V, R, S)).astype(np.float32))


def timeit(name, fn, *a, iters=3):
    try:
        out = jax.block_until_ready(fn(*a))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"exp": name, "error": str(e)[:300]}), flush=True)
        return
    t0 = time.time()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    print(json.dumps({"exp": name, "ms": round((time.time() - t0) / iters * 1e3, 2)}), flush=True)


def rgb_taps(rgbs, x, y):
    return jnp.sum(jax.vmap(bilinear_sample)(rgbs, x, y))


def feat_patch(feats, x, y):
    return jnp.sum(jax.vmap(bilinear_sample)(feats, x * 0.25, y * 0.25))


def rgb_taps_nozeropad(rgbs, x, y):
    return jnp.sum(
        jax.vmap(lambda i, a, b: bilinear_sample(i, a, b, zero_pad=False))(rgbs, x, y)
    )


timeit("rgb_bilinear_oob_coords", jax.jit(rgb_taps), rgbs, x, y)
timeit("rgb_bilinear_inbound_coords", jax.jit(rgb_taps), rgbs, xin, yin)
timeit("rgb_bilinear_clamp", jax.jit(rgb_taps_nozeropad), rgbs, x, y)
timeit("feat_bilinear_patchgather", jax.jit(feat_patch), feats, x, y)

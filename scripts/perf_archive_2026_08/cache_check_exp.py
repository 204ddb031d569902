"""Check whether repeated identical dispatches are served from a cache:
time the same op with (a) identical args every iteration, (b) different
args every iteration."""

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

from pgdvs_tpu.core.interpolate import bilinear_sample

H, W, V = 288, 550, 10
R, S = 2048, 256
rng = np.random.default_rng(0)
rgbs = jnp.asarray(rng.normal(size=(V, H, W, 3)).astype(np.float32)).astype(jnp.bfloat16)

fn = jax.jit(lambda im, a, b: jnp.sum(jax.vmap(bilinear_sample)(im, a, b)))

xs = [
    jnp.asarray(rng.uniform(0, W - 1, (V, R, S)).astype(np.float32)) for _ in range(6)
]
ys = [
    jnp.asarray(rng.uniform(0, H - 1, (V, R, S)).astype(np.float32)) for _ in range(6)
]
jax.block_until_ready([xs, ys])

out = jax.block_until_ready(fn(rgbs, xs[0], ys[0]))  # compile

t0 = time.time()
for i in range(5):
    out = fn(rgbs, xs[0], ys[0])
jax.block_until_ready(out)
same = (time.time() - t0) / 5 * 1e3

t0 = time.time()
for i in range(5):
    out = fn(rgbs, xs[i + 1], ys[i + 1])
jax.block_until_ready(out)
diff = (time.time() - t0) / 5 * 1e3

print(json.dumps({"same_args_ms": round(same, 2), "different_args_ms": round(diff, 2)}))

"""Batched (vmap-over-views) gather vs flat offset-index gather."""

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

H, W, C, V = 288, 550, 32, 10
N = 2048 * 256  # per view
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.normal(size=(V, H * W, C)).astype(np.float32)).astype(jnp.bfloat16)
idx = jnp.asarray(rng.integers(0, H * W, (V, N)).astype(np.int32))


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


def batched(imgs, idx):
    return jax.vmap(lambda im, ix: jnp.take(im, ix, axis=0))(imgs, idx)


def flat(imgs, idx):
    offs = jnp.arange(V, dtype=jnp.int32)[:, None] * (H * W)
    return jnp.take(imgs.reshape(V * H * W, C), (idx + offs).reshape(-1), axis=0)


def flat_bilinear(imgs, idx):
    """4-tap weighted version with flat indices (the real workload shape)."""
    offs = jnp.arange(V, dtype=jnp.int32)[:, None] * (H * W)
    base = (idx + offs).reshape(-1)
    flat_img = imgs.reshape(V * H * W, C)
    w0 = jnp.asarray(0.25, jnp.bfloat16)
    out = 0.0
    for dd in (0, 1, W, W + 1):
        out = out + jnp.take(flat_img, base + dd, axis=0) * w0
    return out


timeit("vmap_batched_take", jax.jit(batched), imgs, idx)
timeit("flat_offset_take", jax.jit(flat), imgs, idx)
timeit("flat_4tap_bilinear", jax.jit(flat_bilinear), imgs, idx)

"""Microbenchmark: gather strategy variants for the epipolar sampler (TPU)."""

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

H, W, C = 288, 550, 32
N = 2048 * 256
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
img_bf = img.astype(jnp.bfloat16)
x = jnp.asarray(rng.uniform(0, W - 1, N).astype(np.float32))
y = jnp.asarray(rng.uniform(0, H - 1, N).astype(np.float32))


def timeit(name, fn, *a, iters=5):
    o = jax.block_until_ready(fn(*a))
    t0 = time.time()
    for _ in range(iters):
        o = fn(*a)
    jax.block_until_ready(o)
    print(json.dumps({"exp": name, "ms": round((time.time() - t0) / iters * 1e3, 2)}), flush=True)


def taps(img, x, y):
    h, w = img.shape[:2]
    flat = img.reshape(h * w, -1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    out = 0.0
    for xi, wx in ((x0, 1 - fx), (x0 + 1, fx)):
        for yi, wy in ((y0, 1 - fy), (y0 + 1, fy)):
            idx = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
            out = out + jnp.take(flat, idx, axis=0) * (wx * wy)[:, None].astype(img.dtype)
    return jnp.sum(out)


def patch(img, x, y):
    from pgdvs_tpu.core.interpolate import gather_2x2

    h, w = img.shape[:2]
    sx = jnp.clip(jnp.floor(x), 0, w - 2).astype(jnp.int32)
    sy = jnp.clip(jnp.floor(y), 0, h - 2).astype(jnp.int32)
    return jnp.sum(gather_2x2(img, sx, sy))


def rowpair(img, x, y):
    h, w = img.shape[:2]
    c = img.shape[-1]
    sx = jnp.clip(jnp.floor(x), 0, w - 2).astype(jnp.int32)
    sy0 = jnp.clip(jnp.floor(y), 0, h - 2).astype(jnp.int32)
    flat = img.reshape(h * w, -1)
    i00 = sy0 * w + sx
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )
    g = lambda idx: jax.lax.gather(
        flat, idx[:, None], dn, slice_sizes=(2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )
    return jnp.sum(g(i00)) + jnp.sum(g(i00 + w))


def main():
    timeit("taps_f32", jax.jit(taps), img, x, y)
    timeit("taps_bf16", jax.jit(taps), img_bf, x, y)
    timeit("patch_f32", jax.jit(patch), img, x, y)
    timeit("patch_bf16", jax.jit(patch), img_bf, x, y)
    timeit("rowpair_f32", jax.jit(rowpair), img, x, y)
    timeit("rowpair_bf16", jax.jit(rowpair), img_bf, x, y)

    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kern(img_ref, idx_ref, out_ref):
            flat = img_ref[:].reshape(-1, C)
            out_ref[:] = jnp.take(flat, idx_ref[:], axis=0)

        def pall(img, idx):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((idx.shape[0], C), img.dtype),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(img, idx)

        idx = (y.astype(jnp.int32) * W + x.astype(jnp.int32))[:8192]
        timeit("pallas_take_8k", jax.jit(pall), img_bf, idx)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"exp": "pallas_take", "error": str(e)[:400]}), flush=True)


if __name__ == "__main__":
    main()

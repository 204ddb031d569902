"""Feasibility: VMEM-resident image gather inside a Pallas kernel."""

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 288, 550, 32
N = 2048 * 256
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(H * W, C)).astype(np.float32)).astype(jnp.bfloat16)
idx = jnp.asarray(rng.integers(0, H * W, N).astype(np.int32))


def timeit(name, fn, *a, iters=5):
    try:
        out = jax.block_until_ready(fn(*a))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"exp": name, "error": str(e)[:500]}), flush=True)
        return
    t0 = time.time()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    print(
        json.dumps(
            {"exp": name, "ms": round((time.time() - t0) / iters * 1e3, 3)}
        ),
        flush=True,
    )


BLK = 4096


def kern_take_along(img_ref, idx_ref, out_ref):
    idx2 = jnp.broadcast_to(idx_ref[:][:, None], (BLK, C))
    out_ref[:] = jnp.take_along_axis(img_ref[:], idx2, axis=0)


def pall_take_along(img, idx):
    grid = idx.shape[0] // BLK
    return pl.pallas_call(
        kern_take_along,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((H * W, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((idx.shape[0], C), img.dtype),
    )(img, idx)


def kern_take(img_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(img_ref[:], idx_ref[:], axis=0)


def pall_take(img, idx):
    grid = idx.shape[0] // BLK
    return pl.pallas_call(
        kern_take,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((H * W, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((idx.shape[0], C), img.dtype),
    )(img, idx)


def xla_take(img, idx):
    return jnp.take(img, idx, axis=0)


timeit("xla_take_full", jax.jit(xla_take), img, idx)
timeit("pallas_take_along", jax.jit(pall_take_along), img, idx)
timeit("pallas_take", jax.jit(pall_take), img, idx)

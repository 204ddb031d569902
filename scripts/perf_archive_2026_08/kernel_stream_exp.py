"""Is the mono3 kernel stream-bound or compute-bound?

Times, at the bench tile shape [V=10, R=4096, S=256, C=35]:
  1. the real mono3 kernel (fold_ray_diff + fold_pos_code [+ fold_mask]);
  2. a stream-only Pallas kernel with IDENTICAL BlockSpecs that just
     reduces its inputs (measures Mosaic's achieved input-stream rate);
  3. a compute-only variant: same kernel but fed from a single grid-step
     VMEM-resident block (measures pure compute with no HBM streaming) —
     approximated by shrinking R to one grid step and looping in-kernel.

RPC round-trip (~24 ms, scripts/probe3) is subtracted via a calibration
no-op dispatch.
"""
import functools
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

V, R, S, F = 10, 4096, 256, 35
RB = 4


def rpc_overhead():
    x = jnp.ones((8,), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    float(jnp.sum(f(x)))
    t0 = time.time()
    for _ in range(10):
        float(jnp.sum(f(x)))
    return (time.time() - t0) / 10


def timed(run, reps=3):
    run(0)
    t0 = time.time()
    for i in range(reps):
        run(i)
    return (time.time() - t0) / reps


def main():
    ovh = rpc_overhead()
    print(f"rpc overhead: {ovh*1e3:.1f} ms", flush=True)

    rng = np.random.default_rng(0)
    rf = jnp.asarray(rng.normal(size=(V, R, S, F)), jnp.bfloat16)
    mk = jnp.ones((V, R, S, 1), jnp.bfloat16)
    pts = jnp.asarray(rng.normal(size=(R, S, 3)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(R, 63)), jnp.float32)
    centers = jnp.asarray(rng.normal(size=(V + 1, 3)), jnp.float32)
    projs = jnp.asarray(rng.normal(size=(V, 4, 4)), jnp.float32)

    # ---- 1. real mono3 (fold_ray_diff + fold_pos_code + separate mask) ----
    from pgdvs_tpu.renderers.static_gnt import make_gnt_models, init_gnt_params
    from pgdvs_tpu.kernels.gnt_fused_mono3 import gnt_fused_apply_mono3

    models = make_gnt_models()
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_gnt_params(jax.random.PRNGKey(0), *models, n_src=V)
    gp = jax.device_put(params["gnt"], jax.devices()[0])

    def run_real(i):
        out = gnt_fused_apply_mono3(
            gp, rf, None, mk, None, vc, ray_block=RB, views_outer=True,
            pts=pts, cam_centers=centers, separate_mask=True,
            fold_pos_code=True,
        )
        return float(jnp.sum(out["rgb"]))

    dt = timed(run_real) - ovh
    print(f"mono3 real:        {dt*1e3:7.1f} ms/tile", flush=True)

    def run_fm(i):
        out = gnt_fused_apply_mono3(
            gp, rf, None, None, None, vc, ray_block=RB, views_outer=True,
            pts=pts, cam_centers=centers, fold_pos_code=True,
            fold_mask_hw=(288.0, 550.0), proj_mats=projs,
        )
        return float(jnp.sum(out["rgb"]))

    dt = timed(run_fm) - ovh
    print(f"mono3 fold_mask:   {dt*1e3:7.1f} ms/tile", flush=True)

    # ---- 2. stream-only kernel: same input block shapes, reduce to tiny ----
    def _stream_kernel(rf_ref, mk_ref, pts_ref, out_ref):
        x = rf_ref[:].astype(jnp.float32)
        out_ref[0, 0] = (
            jnp.sum(x)
            + jnp.sum(mk_ref[:].astype(jnp.float32))
            + jnp.sum(pts_ref[:])
        )

    grid = (R // RB,)
    stream = pl.pallas_call(
        _stream_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((V, RB, S, F), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, RB, S, 1), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, S, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0], 1), jnp.float32),
    )
    run_stream = lambda i: float(jnp.sum(stream(rf, mk, pts)))
    dt = timed(run_stream) - ovh
    gb = (rf.nbytes + mk.nbytes + pts.nbytes) / 1e9
    print(
        f"stream-only:       {dt*1e3:7.1f} ms/tile "
        f"({gb:.2f} GB -> {gb/dt:.0f} GB/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()

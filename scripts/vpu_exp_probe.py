"""Probe: VPU exp / divide / fma throughput inside a Pallas kernel.

Determines whether the mono4 softmaxes (view: 5.2M exps/grid-step, ray:
8.4M) are bound by the transcendental rate — i.e. whether a cheaper exp
or a restructured softmax is worth building. Each variant runs the same
[ROWS, 128] f32 stream through ITERS dependent passes so the op under
test dominates; timings subtract the measured RPC overhead.

WARNING (2026-08-19): launching this with a big PROBE_ITERS cold wedged
the axon REMOTE COMPILE queue for hours — killing the client does NOT
cancel the server-side compile, and every retry queues another one.
Start with PROBE_ITERS<=256 in a bounded foreground run; scale up only
after the small run returns. Ops are selectable via argv.
"""
import json, os, pathlib, sys, time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 4096
ITERS = int(os.environ.get("PROBE_ITERS", "16384"))


def make_kernel(op, iters):
    def one(x):
        if op == "exp":
            return jnp.exp(x)
        elif op == "exp_bf16":
            return jnp.exp(x.astype(jnp.bfloat16)).astype(jnp.float32)
        elif op == "exp2":
            return jnp.exp2(x)
        elif op == "mul":
            return x * 1.000001
        elif op == "fma":
            return x * 1.000001 + 0.000001
        elif op == "div":
            return x / 1.000001
        elif op == "recip":
            return jax.lax.reciprocal(x)
        elif op == "rsqrt":
            return jax.lax.rsqrt(jnp.abs(x) + 1.0)
        elif op == "max":
            return jnp.maximum(x, 0.1)
        raise ValueError(op)

    def body(x_ref, o_ref):
        x = x_ref[:]

        def step(_, carry):
            acc, x = carry
            y = one(x)
            return acc + y, x + 1e-7

        acc, _ = jax.lax.fori_loop(
            0, iters, step, (jnp.zeros_like(x), x)
        )
        o_ref[:] = acc

    return body


def run_op(op):
    x = jnp.full((ROWS, 128), -0.5, jnp.float32)

    def timed(iters):
        f = pl.pallas_call(
            make_kernel(op, iters),
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
        )
        g = jax.jit(f)
        float(jnp.sum(g(x)))  # compile
        t0 = time.time()
        for _ in range(4):
            float(jnp.sum(g(x)))
        return (time.time() - t0) / 4

    # two-point: the delta cancels RPC + fixed kernel overheads
    t1, t2 = timed(ITERS), timed(2 * ITERS)
    n = ROWS * 128 * ITERS
    return n / max(t2 - t1, 1e-9) / 1e9  # G elems/s for the op+2 adds body


if __name__ == "__main__":
    res = {}
    ops = sys.argv[1:] or ["mul", "fma", "max", "div", "recip", "rsqrt",
                           "exp", "exp2", "exp_bf16"]
    for op in ops:
        res[op] = round(run_op(op), 1)
        print(json.dumps({op: res[op]}), flush=True)
    print(json.dumps({"G_elems_per_s": res}))

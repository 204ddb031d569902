"""Device-rate probes, round 3 session 5: int8 MXU rate and gather locality.

Questions:
  1. Does this device run int8 matmuls at ~2x its bf16 rate (nominal v5e:
     394 TOPS int8 vs 197 TFLOPs bf16)? If yes, an int8 path for the GNT
     kernel's hoisted wide matmuls could shave seconds; if the degradation
     applies equally, it cannot.
  2. Is the XLA gather row rate sensitive to index locality (sorted vs
     random vs strided)? The epipolar taps have strong natural locality
     (consecutive samples along a ray land on nearby pixels); if sorted
     indices gather much faster, the measured 58 M rows/s random-rate is
     NOT the wall the render actually hits — and vice versa.
  3. Gather rate vs row width: is the row *byte* count free (issue-bound)
     across widths 35/70/140, confirming the round-2/3 int8-maps result?
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")

import jax
import jax.numpy as jnp
import jax.lax as lax


def timed(f, *args, reps=3):
    r = f(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x.astype(jnp.float32)).item())
        if hasattr(x, "astype")
        else x,
        r,
    )
    t0 = time.time()
    for _ in range(reps):
        r = f(*args)
        jax.tree_util.tree_map(
            lambda x: float(jnp.sum(x.astype(jnp.float32)).item())
            if hasattr(x, "astype")
            else x,
            r,
        )
    return (time.time() - t0) / reps


def matmul_rate(dtype, acc_dtype, iters=64, n=2048):
    a = (jnp.ones((n, n)) * 0.001).astype(dtype)
    b = jnp.eye(n, dtype=dtype)

    @jax.jit
    def chain(x):
        def body(i, y):
            z = lax.dot_general(
                y, b, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
            return z.astype(dtype)

        return lax.fori_loop(0, iters, body, x)

    dt = timed(chain, a)
    return iters * 2.0 * n**3 / dt / 1e12


def gather_rate(order: str, n_rows=4_000_000, width=140, table_rows=1_600_000):
    table = jnp.ones((table_rows, width), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(0), (n_rows,), 0, table_rows)
    if order == "sorted":
        idx = jnp.sort(idx)
    elif order == "iota":
        idx = (jnp.arange(n_rows) * table_rows // n_rows).astype(jnp.int32)
    elif order == "local":
        # epipolar-like: blocks of 256 consecutive-ish rows (a ray's samples
        # march along an epipolar line => neighboring pixels => nearby rows)
        base = jax.random.randint(
            jax.random.PRNGKey(1), (n_rows // 256,), 0, table_rows - 512
        )
        step = jax.random.randint(
            jax.random.PRNGKey(2), (n_rows // 256, 256), 0, 2
        )
        idx = (base[:, None] + jnp.cumsum(step, axis=1)).reshape(-1)

    @jax.jit
    def f(t, i):
        return jnp.sum(jnp.take(t, i, axis=0, mode="clip").astype(jnp.float32))

    dt = timed(lambda: f(table, idx))
    return n_rows / dt / 1e6


def main():
    print(f"device: {jax.devices()[0]}")
    print(f"bf16   matmul: {matmul_rate(jnp.bfloat16, jnp.float32):7.1f} TFLOP/s")
    try:
        print(f"int8   matmul: {matmul_rate(jnp.int8, jnp.int32):7.1f} TOP/s")
    except Exception as e:
        print(f"int8   matmul: FAILED {e!r}")
    try:
        print(f"f32    matmul: {matmul_rate(jnp.float32, jnp.float32):7.1f} TFLOP/s")
    except Exception as e:
        print(f"f32    matmul: FAILED {e!r}")
    for order in ("random", "sorted", "local", "iota"):
        try:
            print(f"gather[{order:6s}] w=140: {gather_rate(order):7.1f} M rows/s")
        except Exception as e:
            print(f"gather[{order:6s}]: FAILED {e!r}")
    for width in (35, 70, 280):
        print(
            f"gather[random] w={width:3d}: "
            f"{gather_rate('random', width=width):7.1f} M rows/s"
        )


if __name__ == "__main__":
    main()

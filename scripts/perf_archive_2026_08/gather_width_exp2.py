"""Gather rate vs row width, extended to patch-row widths (round 4).

If the XLA gather is issue-rate bound well past 280 B rows, one gathered
row can carry a multi-pixel patch serving several epipolar taps at once
(adjacent target rays project ~1 px apart in every source view), cutting
the per-view tap gather 4-8x. This probe measures rows/s at widths
35..1260 ch bf16 (70 B..2.5 KB) and the implied GB/s.
"""
import os, time, json
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import jax, jax.numpy as jnp

def measure_rpc(reps=10):
    x = jnp.ones((8,), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    float(jnp.sum(f(x)))
    t0 = time.time()
    for _ in range(reps):
        float(jnp.sum(f(x)))
    return (time.time() - t0) / reps

def gather_rate(width, n_rows=8_000_000, table_rows=1_600_000, ovh=0.0):
    table = jnp.ones((table_rows, width), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(0), (n_rows,), 0, table_rows)
    @jax.jit
    def f(t, i):
        return jnp.sum(jnp.take(t, i, axis=0, mode="clip").astype(jnp.float32))
    float(f(table, idx))
    t0 = time.time()
    float(f(table, idx))
    dt = max(time.time() - t0 - ovh, 1e-6)
    return n_rows / dt

ovh = measure_rpc()
print(json.dumps({"rpc_ms": round(ovh * 1e3, 1)}), flush=True)
for w in (35, 140, 280, 560, 576, 840, 1152, 1260):
    try:
        r = gather_rate(w, ovh=ovh)
        print(json.dumps({
            "width_ch": w, "row_bytes": w * 2,
            "mrows_s": round(r / 1e6, 1),
            "gbps": round(r * w * 2 / 1e9, 1),
        }), flush=True)
    except Exception as e:
        print(json.dumps({"width_ch": w, "error": str(e)[:200]}), flush=True)

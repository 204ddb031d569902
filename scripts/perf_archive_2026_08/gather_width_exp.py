"""Gather rate vs row width + sample-pair geometry stats.

Two questions that decide the next sampling redesign:
  1. Is the XLA gather's per-row cost flat in row width (issue-bound) or
     does it grow? If flat up to ~324ch, merging SAMPLE PAIRS into one
     3x3-stencil row halves the row count outright.
  2. At bench geometry, how far apart in source-pixel space are consecutive
     samples of the same (ray, view)? Pairs within a 3x3 cell stencil are
     servable EXACTLY by one row; the tail must be clamped (approximated).

All timings subtract the tunnel's RPC round trip (see bench.py).
"""
import json, os, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")
import numpy as np
import jax, jax.numpy as jnp


def rpc_overhead():
    x = jnp.ones((8,), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    float(jnp.sum(f(x)))
    t0 = time.time()
    for _ in range(10):
        float(jnp.sum(f(x)))
    return (time.time() - t0) / 10


OVH = rpc_overhead()
print(json.dumps({"rpc_ms": round(OVH * 1e3, 1)}), flush=True)

N_ROWS = 16_000_000
TABLE_ROWS = 1_584_000  # 10 views x 288 x 550


def probe(width, n_rows=N_ROWS, dtype=jnp.bfloat16):
    table = jnp.ones((TABLE_ROWS, width), dtype)
    idx = jax.random.randint(jax.random.PRNGKey(0), (n_rows,), 0, TABLE_ROWS)

    @jax.jit
    def f(t, i):
        return jnp.sum(jnp.take(t, i, axis=0, mode="clip").astype(jnp.float32))

    float(f(table, idx))
    t0 = time.time()
    float(f(table, idx))
    dt = max(time.time() - t0 - OVH, 1e-6)
    print(json.dumps({
        "exp": f"gather_w{width}_{np.dtype(dtype.dtype if hasattr(dtype,'dtype') else 'bfloat16').name if False else 'bf16'}",
        "width": width, "n_rows": n_rows,
        "mrows_per_s": round(n_rows / dt / 1e6, 1),
        "gb_per_s": round(n_rows * width * 2 / dt / 1e9, 1),
        "ms": round(dt * 1e3, 1),
    }), flush=True)


for w in (36, 72, 144, 216, 288, 324, 432, 576):
    probe(w)

# --- pair-distance stats at bench geometry ---------------------------------
from pgdvs_tpu.data.synthetic import make_contract_data
from pgdvs_tpu.core import cameras, sampling
from pgdvs_tpu.models.gnt.projector import project_all_views

h, w = 288, 550
data = make_contract_data(h=h, w=w, n_spatial=10, n_frames=12, tgt_time=0.5)
tgt_cam = jnp.asarray(data["flat_cam_tgt"])
src_cams = jnp.asarray(data["flat_cam_src_spatial"])
depth_range = jnp.asarray(data["depth_range"])

rays_o, rays_d, _uv, (rh, rw) = cameras.get_rays(
    h, w, cameras.flat_cam_intrinsics(tgt_cam), cameras.flat_cam_c2w(tgt_cam)
)
# subsample rays to keep it light
sel = jnp.arange(0, rh * rw, 37)
dr = jnp.broadcast_to(depth_range, (sel.shape[0], 2))
pts, z = sampling.sample_along_rays(
    rays_o[sel], rays_d[sel], dr, 256, inv_uniform=True, deterministic=True
)
uv, zz, in_front = project_all_views(pts, src_cams)  # [V, R, S, 2]
uv = np.asarray(uv)
inb = (
    (uv[..., 0] >= 0) & (uv[..., 0] <= w - 1)
    & (uv[..., 1] >= 0) & (uv[..., 1] <= h - 1)
    & np.asarray(in_front)
)
# distance between consecutive samples' projections (same ray, view)
d = np.abs(uv[:, :, 1:] - uv[:, :, :-1])  # [V, R, S-1, 2] per-axis
both_in = inb[:, :, 1:] & inb[:, :, :-1]
dmax = d.max(-1)[both_in]  # chebyshev distance, only where both taps matter
# a pair fits a (1+k)x(1+k)-cell stencil (base at min floor) iff
# floor coords differ by <= k-1 in each axis; conservatively |du|<=k-1
for k in (1, 2, 3):
    print(json.dumps({
        "exp": f"pair_fits_{k+2}x{k+2}cells",
        "frac": round(float((dmax <= k).mean()), 4),
    }), flush=True)
print(json.dumps({
    "exp": "pair_dist_quantiles",
    "q50": round(float(np.quantile(dmax, 0.5)), 2),
    "q90": round(float(np.quantile(dmax, 0.9)), 2),
    "q99": round(float(np.quantile(dmax, 0.99)), 2),
    "max": round(float(dmax.max()), 1),
    "n_pairs_considered": int(dmax.size),
    "inbound_tap_frac": round(float(inb.mean()), 3),
}), flush=True)

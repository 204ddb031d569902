"""Device-trace profile of the bench render: per-op device_duration breakdown.

jax.profiler works on the axon backend and reports per-op
`device_duration_ps` + `model_flops` + `bytes_accessed` (verified: a
2048^3 bf16 matmul fusion runs at 189 TFLOP/s — NOMINAL v5e rate; every
prior "this tunneled device is degraded to 10-15%" reading was polluted
by the ~24 ms RPC round-trip in small timed probes, scripts/probe3).

Usage: python scripts/profile_render_trace.py [trace_dir]
Env: same BENCH_* knobs as bench.py.
"""
import collections
import glob
import gzip
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache")

import jax
import jax.numpy as jnp


def build_render():
    from pgdvs_tpu.data.synthetic import make_contract_data
    from pgdvs_tpu.renderers.compose import render_novel_view
    from pgdvs_tpu.renderers.config import RenderConfig
    from pgdvs_tpu.renderers.static_gnt import init_gnt_params, make_gnt_models

    h, w = 288, 550
    n_src = 10
    cfg = RenderConfig(
        n_coarse_samples_per_ray=256,
        sample_inv_uniform=True,
        gnt_use_masked_spatial_src=True,
        ray_tile=int(os.environ.get("BENCH_RAY_TILE", "2048")),
        epipolar_mode=os.environ.get("BENCH_EPI_MODE", "patch"),
        use_pallas_gnt=os.environ.get("BENCH_PALLAS_GNT", "1") == "1",
        pallas_ray_block=int(os.environ.get("BENCH_RAY_BLOCK", "4")),
        pallas_kernel=os.environ.get("BENCH_PALLAS_KERNEL", "mono4"),
        pallas_fold_ray_diff=os.environ.get("BENCH_FOLD_RAY_DIFF", "1") == "1",
        pallas_fold_pos_code=os.environ.get("BENCH_FOLD_POS_CODE", "1") == "1",
        pallas_fold_mask=os.environ.get("BENCH_FOLD_MASK", "1") == "1",
        pallas_fold_lerp=os.environ.get("BENCH_FOLD_LERP", "0") == "1",
        pallas_ablate=os.environ.get("BENCH_PALLAS_ABLATE", ""),
        pallas_precompute_kv=os.environ.get("BENCH_PKV", "1") == "1",
        pallas_patch_block=os.environ.get("BENCH_PATCH_BLOCK", "4x2"),
    )
    data = make_contract_data(h=h, w=w, n_spatial=n_src, n_frames=12, tgt_time=0.5)
    dev_data = {
        k: jnp.asarray(v) for k, v in data.items() if not isinstance(v, (dict, str))
    }
    models = make_gnt_models()
    params = jax.jit(
        lambda k: init_gnt_params(k, *models, n_src=n_src)
    )(jax.random.PRNGKey(0))
    params = jax.block_until_ready(params)
    render = jax.jit(
        lambda p, d, k: render_novel_view(models, p, d, cfg, k, static_mode="gnt")
    )
    return render, params, dev_data


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/render_trace"
    render, params, dev_data = build_render()

    def run(i):
        out = render(params, dev_data, jax.random.PRNGKey(i))
        return float(jnp.sum(out["combined_rgb"]))

    t0 = time.time()
    run(0)
    print(f"warm/compile: {time.time()-t0:.1f} s", flush=True)
    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        run(1)
    print(f"traced run: {time.time()-t0:.1f} s", flush=True)

    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(files[-1]) as f:
        t = json.load(f)
    ev = t["traceEvents"]
    # device pid
    dev_pids = {
        e["pid"]
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in e["args"]["name"]
    }
    ops = [
        e
        for e in ev
        if e.get("ph") == "X"
        and e["pid"] in dev_pids
        and "device_duration_ps" in e.get("args", {})
        and e.get("tid") != 2  # tid 2 = XLA Modules (whole-program spans)
    ]
    by_name = collections.defaultdict(lambda: [0.0, 0, 0.0, 0.0, ""])
    total = 0.0
    for e in ops:
        dur = int(e["args"]["device_duration_ps"]) / 1e12
        total += dur
        a = e["args"]
        key = e["name"].rstrip("0123456789.")
        rec = by_name[key]
        rec[0] += dur
        rec[1] += 1
        rec[2] += float(a.get("model_flops", 0) or 0)
        rec[3] += float(a.get("raw_bytes_accessed", 0) or 0)
        if not rec[4]:
            rec[4] = (a.get("hlo_category", "") + " | " + a.get("long_name", ""))[:160]
    print(f"\ntotal device op time: {total:.2f} s over {len(ops)} op events")
    print(f"{'op':36s} {'s':>7s} {'n':>6s} {'TFLOP/s':>8s} {'GB/s':>7s}  kind")
    for name, (dur, n, fl, by, ln) in sorted(
        by_name.items(), key=lambda kv: -kv[1][0]
    )[:40]:
        tf = fl / dur / 1e12 if dur else 0
        gb = by / dur / 1e9 if dur else 0
        print(f"{name[:36]:36s} {dur:7.3f} {n:6d} {tf:8.1f} {gb:7.1f}  {ln[:70]}")


if __name__ == "__main__":
    main()

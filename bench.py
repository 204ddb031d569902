"""Benchmark: full novel-view render at the reference's evaluation scale.

Renders one 288x550 novel view exactly as the reference benchmark does
(10 source views, 256 coarse samples/ray, inverse-uniform deterministic
sampling — ``/root/reference/scripts/benchmark.sh:320-323``) through the
full pipeline (GNT static + dynamic softsplat + composite) and reports
chip-seconds per view.

Baseline: the reference needs ~87 A100-GPU-seconds per novel view
(``docs/BENCHMARK_NVIDIA.md:148-149``); vs_baseline = 87 / measured
(>1 means faster than the reference).

Prints ONE JSON line.
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/pgdvs_tpu_jax_cache"
)

import numpy as np
import jax
import jax.numpy as jnp


def measure_rpc_overhead_s(reps: int = 10) -> float:
    """Per-dispatch RPC round trip of the tunneled backend (~24 ms here).

    EVERY device probe must subtract this: timings whose true device time
    is <~200 ms are otherwise dominated by it (this artifact produced the
    rounds-1-3 "device degraded to 10-15% of nominal" misreading — a traced
    2048^3 bf16 matmul fusion actually runs at ~189 TFLOP/s ~= nominal v5e;
    scripts/profile_render_trace.py)."""
    x = jnp.ones((8,), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    float(jnp.sum(f(x)))
    t0 = time.time()
    for _ in range(reps):
        float(jnp.sum(f(x)))
    return (time.time() - t0) / reps


def measure_device_bf16_tflops(ovh: float, iters: int = 512, n: int = 2048) -> float:
    """Sustained bf16 matmul rate of the attached device, in TFLOP/s.

    iters chained [n,n]x[n,n] bf16 matmuls in one dispatch (the loop value
    stays VMEM-resident, so this approaches the pure MXU rate), RPC
    overhead subtracted."""
    import jax.lax as lax

    a = jnp.ones((n, n), jnp.bfloat16) * 0.001
    b = jnp.eye(n, dtype=jnp.bfloat16)

    @jax.jit
    def chain(x):
        return lax.fori_loop(0, iters, lambda i, y: y @ b, x)

    float(jnp.sum(chain(a).astype(jnp.float32)))  # compile + warm
    t0 = time.time()
    float(jnp.sum(chain(a).astype(jnp.float32)))
    dt = max(time.time() - t0 - ovh, 1e-6)
    return iters * 2.0 * n**3 / dt / 1e12


def measure_hbm_copy_gbps(ovh: float, mb: int = 4096) -> float:
    """HBM streaming bandwidth (read+write) via a scaled copy, in GB/s."""
    n = mb * 1024 * 1024 // 2
    x = jnp.ones((n,), jnp.bfloat16)

    @jax.jit
    def f(x):
        return x * jnp.bfloat16(1.0001)

    y = f(x)
    float(jnp.sum(y[:8].astype(jnp.float32)))
    t0 = time.time()
    y = f(y)
    float(jnp.sum(y[:8].astype(jnp.float32)))
    dt = max(time.time() - t0 - ovh, 1e-6)
    return 2 * n * 2 / dt / 1e9


def measure_gather_rows_per_s(
    ovh: float, n_rows: int = 16_000_000, width: int = 140
) -> float:
    """XLA gather issue rate (rows/s) at the render's row shape: random rows
    from a bf16 [1.6M, width] table — the epipolar sampler's access pattern."""
    table = jnp.ones((1_600_000, width), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(0), (n_rows,), 0, 1_600_000)

    @jax.jit
    def f(t, i):
        return jnp.sum(jnp.take(t, i, axis=0, mode="clip").astype(jnp.float32))

    float(f(table, idx))
    t0 = time.time()
    float(f(table, idx))
    dt = max(time.time() - t0 - ovh, 1e-6)
    return n_rows / dt


def main():
    from pgdvs_tpu.data.synthetic import make_contract_data
    from pgdvs_tpu.renderers.compose import render_novel_view
    from pgdvs_tpu.renderers.config import RenderConfig
    from pgdvs_tpu.renderers.static_gnt import init_gnt_params, make_gnt_models

    h, w = 288, 550
    n_src = 10
    # BENCH_DYN_MASK=1: masked view attention (the reference's default/
    # masked_attn bundles) — pair with BENCH_EPI_MODE=quad
    # BENCH_PALLAS_KERNEL=mono3 BENCH_FOLD_MASK=0 (the masked perf preset;
    # patch/fold_mask cannot carry a dyn mask). BENCH_STATIC_MODE=geo:
    # the pure-geometry bundles (st_cvd_*) — the GNT knobs are inert there.
    dyn_mask = os.environ.get("BENCH_DYN_MASK", "0") == "1"
    static_mode = os.environ.get("BENCH_STATIC_MODE", "gnt")
    cfg = RenderConfig(
        n_coarse_samples_per_ray=int(os.environ.get("BENCH_N_COARSE", "256")),
        n_fine_samples_per_ray=int(os.environ.get("BENCH_N_FINE", "0")),
        sample_inv_uniform=True,
        gnt_use_dyn_mask=dyn_mask,
        gnt_use_masked_spatial_src=not dyn_mask,
        # rt 2048 + patch measured fastest (8.92 s/view): patch rows at
        # rt 4096 gain nothing (8.97) and quad's larger combine fusions
        # favored 4096 — see STATUS.md round-4 trajectory
        ray_tile=int(os.environ.get("BENCH_RAY_TILE", "2048")),
        epipolar_mode=os.environ.get("BENCH_EPI_MODE", "patch"),
        use_pallas_gnt=os.environ.get("BENCH_PALLAS_GNT", "1") == "1",
        # rb=8: both quads of a 4x2 patch block share one grid step — 8.30
        # vs rb=4's 8.55 s/view (round 5); needs BENCH_PKV=0 (per-block k/v
        # slices fit VMEM) + the raised scoped-VMEM budget below
        pallas_ray_block=int(os.environ.get("BENCH_RAY_BLOCK", "8")),
        pallas_kernel=os.environ.get("BENCH_PALLAS_KERNEL", "mono4"),
        pallas_fold_ray_diff=os.environ.get("BENCH_FOLD_RAY_DIFF", "1") == "1",
        pallas_fold_pos_code=os.environ.get("BENCH_FOLD_POS_CODE", "1") == "1",
        pallas_fold_mask=os.environ.get("BENCH_FOLD_MASK", "1") == "1",
        # fold_lerp measured SLOWER end-to-end: the raw-rows stream forces
        # ray_tile 2048 (HBM capacity), whose per-tile costs outweigh the
        # lerp-pass saving (21.5 s vs 19.3 s) — off by default
        pallas_fold_lerp=os.environ.get("BENCH_FOLD_LERP", "0") == "1",
        pallas_ablate=os.environ.get("BENCH_PALLAS_ABLATE", ""),
        pallas_precompute_kv=os.environ.get("BENCH_PKV", "0") == "1",
        # 4x2: 8 rays share one 6x4-pixel gather row — 8.605 s/view vs
        # 2x2's 8.92 (the gather is row-issue-bound; halving rows wins
        # more than the wider in-kernel combine costs)
        pallas_patch_block=os.environ.get("BENCH_PATCH_BLOCK", "4x2"),
    )

    # BENCH_TRACKER: also time the tracking config (reference quantifies
    # +TAPIR ~2.5x and +CoTracker ~5x the 87 GPU-s default —
    # docs/BENCHMARK_NVIDIA.md:150). 'lk' is the weight-free stand-in.
    bench_tracker = os.environ.get("BENCH_TRACKER", "")
    k_track = int(os.environ.get("BENCH_K_TRACK", "2"))
    data = make_contract_data(
        h=h, w=w, n_spatial=n_src, n_frames=12, tgt_time=0.5,
        k_track=k_track if bench_tracker else 0,
    )
    dev_data = {
        k: jnp.asarray(v) for k, v in data.items() if not isinstance(v, (dict, str))
    }

    models = make_gnt_models()
    params = jax.jit(lambda k: init_gnt_params(k, *models, n_src=n_src))(
        jax.random.PRNGKey(0)
    )
    params = jax.block_until_ready(params)

    # BENCH_SCOPED_VMEM_KIB: override XLA's scoped-VMEM budget (default:
    # whatever the config needs per compiler_options_for — rb>=8 requires
    # ~96 MiB; XLA's own default ~18.25 MiB refuses it). Passes through the
    # axon tunnel as a per-jit compiler option (XLA_FLAGS does NOT — the
    # local CPU plugin rejects TPU-only flags at parse time).
    from pgdvs_tpu.renderers.config import compiler_options_for

    scoped_kib = int(os.environ.get("BENCH_SCOPED_VMEM_KIB", "0"))
    copts = (
        {"xla_tpu_scoped_vmem_limit_kib": scoped_kib}
        if scoped_kib
        else compiler_options_for(cfg)
    )
    render = jax.jit(
        lambda p, d, k: render_novel_view(models, p, d, cfg, k, static_mode=static_mode),
        compiler_options=copts,
    )

    # NOTE: this environment's tunneled TPU backend does NOT synchronize on
    # block_until_ready — force execution by fetching a scalar reduction.
    def run(i):
        out = render(params, dev_data, jax.random.PRNGKey(i))
        return float(jnp.sum(out["combined_rgb"]))

    # compile (not timed: the per-view cost is what the 87 GPU-s baseline
    # measures; compile amortizes over 15,840 benchmark views)
    t0 = time.time()
    _ = run(0)
    compile_s = time.time() - t0

    # >=5 iters + per-iter spread: the tunneled backend has ~26 ms RPC
    # jitter per dispatch, and 3-iter means drifted ~3% between runs
    # (commit b930796's 12.75 vs BENCH_r03's 13.10)
    n_iters = int(os.environ.get("BENCH_ITERS", "5"))
    iter_s = []
    for i in range(n_iters):
        t0 = time.time()
        _ = run(i)
        iter_s.append(time.time() - t0)
    per_view = sum(iter_s) / n_iters
    out = render(params, dev_data, jax.random.PRNGKey(0))

    track_s = None
    if bench_tracker:
        from pgdvs_tpu.models.tracking import LucasKanadeTracker

        if bench_tracker == "tapir":
            # random weights when the ckpt is unprovisionable — identical
            # FLOPs/memory profile, so the COST datum is still honest
            from pgdvs_tpu.models.tracking.tapir import make_tapir_tracker

            tracker = make_tapir_tracker(
                ckpt_path=os.environ.get("PGDVS_TAPIR_CKPT")
            )
        else:
            tracker = LucasKanadeTracker()
        cfg_track = cfg.replace(
            dyn_render_track_temporal="no_tgt",
            # query capacity: the eval default (0 = every pixel) makes the
            # STATIC-shape tracker pay for all H*W slots even where the
            # reference's dynamic shapes pay only for actual dyn-mask
            # pixels — for a comparable COST datum the bench defaults to a
            # typical dynamic-region size (~10% of 288x550); override with
            # BENCH_TRACK_QUERIES=0 for the worst-case capacity
            track_queries_per_frame=int(
                os.environ.get("BENCH_TRACK_QUERIES", "16384")
            ),
        )
        render_track = jax.jit(
            lambda p, d, k: render_novel_view(
                models, p, d, cfg_track, k, static_mode=static_mode, tracker=tracker
            ),
            compiler_options=copts if scoped_kib else compiler_options_for(cfg_track),
        )

        def run_track(i):
            out = render_track(params, dev_data, jax.random.PRNGKey(i))
            return float(jnp.sum(out["combined_rgb"]))

        _ = run_track(0)  # compile
        t0 = time.time()
        n_track_iters = max(2, n_iters // 2)
        for i in range(n_track_iters):
            _ = run_track(i)
        track_s = (time.time() - t0) / n_track_iters

    baseline_gpu_s = 87.0
    extra = {
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
        "n_src": n_src,
        "n_samples": cfg.n_coarse_samples_per_ray,
        "n_fine": cfg.n_fine_samples_per_ray,
        "iters": n_iters,
        "iter_min_s": round(min(iter_s), 3),
        "iter_max_s": round(max(iter_s), 3),
        "epipolar_mode": cfg.epipolar_mode,
        "pallas_kernel": cfg.pallas_kernel,
        "gnt_use_dyn_mask": dyn_mask,
        "static_mode": static_mode,
    }
    if track_s is not None:
        extra["track_s_per_view"] = round(track_s, 4)
        extra["tracker"] = bench_tracker
    try:
        ovh = measure_rpc_overhead_s()
        extra["rpc_roundtrip_ms"] = round(ovh * 1e3, 1)
        tflops = measure_device_bf16_tflops(ovh)
        extra["device_bf16_tflops_measured"] = round(tflops, 1)
        extra["device_frac_of_nominal_v5e"] = round(tflops / 197.0, 3)
        extra["device_hbm_copy_gbps"] = round(measure_hbm_copy_gbps(ovh), 1)
        extra["device_gather_mrows_per_s"] = round(
            measure_gather_rows_per_s(ovh) / 1e6, 1
        )
    except Exception as e:  # never let the probe break the scored line
        extra["device_rate_probe_error"] = repr(e)
    print(
        json.dumps(
            {
                "metric": "chip_seconds_per_novel_view_288x550",
                "value": round(per_view, 4),
                "unit": "s",
                "vs_baseline": round(baseline_gpu_s / per_view, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())

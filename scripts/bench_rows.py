"""Measure the per-bundle perf rows for docs/BENCHMARK.md (VERDICT r4 #4/#7).

Runs ``bench.py`` once per named row (serially — ONE chip), collecting each
JSON line into ``docs/perf_rows_r05.json``. Rows mirror the reference's cost
table (``/root/reference/docs/BENCHMARK_NVIDIA.md:148-150``: default ~87
GPU-s/view, +TAPIR ~2.5x, +CoTracker ~5x) plus the ablation families the
verdict asked to quantify (fine sampling, masked attention, pure-geometry,
exact sampler).

compile_s in each row doubles as the compile-cost datum: bench.py pins
JAX_COMPILATION_CACHE_DIR=/tmp/pgdvs_tpu_jax_cache, so rerunning a row
measures the warm-cache compile (the ``flagship_warm`` row is exactly that).

Usage: python scripts/bench_rows.py [row ...]   (default: all missing rows)
"""

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
OUT = REPO / "docs" / "perf_rows_r05.json"

# row -> extra env for bench.py (defaults = the flagship fast preset)
ROWS = {
    # the production default (no dyn mask -> flagship preset); run LAST of
    # the flagship-config rows so its compile_s reads the warm cache
    "flagship_warm": {},
    # exact reference-faithful sampler (--perf-preset exact); rb=4 pinned —
    # mono3 does not take the rb=8 grid the flagship default now uses
    "exact": {"BENCH_EPI_MODE": "exact", "BENCH_PALLAS_KERNEL": "mono3",
              "BENCH_FOLD_RAY_DIFF": "0", "BENCH_FOLD_POS_CODE": "0",
              "BENCH_FOLD_MASK": "0", "BENCH_RAY_BLOCK": "4"},
    # masked view attention (the reference 'default' bundle) on its perf
    # preset: mono3 + quad + ray-diff/pos-code folds, rb=4 (preset value)
    "masked_fast": {"BENCH_DYN_MASK": "1", "BENCH_EPI_MODE": "quad",
                    "BENCH_PALLAS_KERNEL": "mono3", "BENCH_FOLD_MASK": "0",
                    "BENCH_RAY_BLOCK": "4"},
    # fine importance resampling (coarse 256 + fine 64, two GNT passes)
    "fine64": {"BENCH_N_FINE": "64"},
    # tracking bundles: base render + track_s_per_view extra.
    # lk = weight-free stand-in; tapir = real architecture, random weights
    # (identical FLOPs/memory -> honest COST datum)
    "track_lk": {"BENCH_TRACKER": "lk"},
    "track_tapir": {"BENCH_TRACKER": "tapir"},
    # pure-geometry static branch (st_cvd_* bundles) — GNT knobs inert
    "pure_geo": {"BENCH_STATIC_MODE": "geo"},
    # masked attention on the exact sampler, flax path (use_pallas_gnt=0 is
    # the documented route around the mono3+exact+mask Mosaic fault)
    "masked_exact_flax": {"BENCH_DYN_MASK": "1", "BENCH_EPI_MODE": "exact",
                          "BENCH_PALLAS_GNT": "0"},
    # perf experiment: larger ray tile with the 4x2 patch path (2x2 showed
    # no gain at rt4096; the 4x2 combine is narrower — retest)
    "rt4096": {"BENCH_RAY_TILE": "4096"},
    # perf experiment: precomputed k/v at rb=8 — the round-4 note said it
    # does not fit VMEM, but that predates the raised scoped-VMEM budget;
    # saves the in-kernel per-block k/v matmuls if it compiles
    "rb8_pkv1": {"BENCH_PKV": "1", "BENCH_SCOPED_VMEM_KIB": "131072"},
}


def run_row(name: str, env_extra: dict) -> dict:
    env = dict(os.environ, **env_extra)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = None
    for ln in (proc.stdout or "").splitlines():
        ln = ln.strip()
        if ln.startswith("{") and '"metric"' in ln:
            line = json.loads(ln)
    if line is None:
        return {"row": name, "error": (proc.stderr or "")[-2000:],
                "wall_s": round(time.time() - t0, 1)}
    line["row"] = name
    line["env"] = env_extra
    line["wall_s"] = round(time.time() - t0, 1)
    return line


def main(argv):
    rows = dict(OUT.exists() and {
        r["row"]: r for r in json.loads(OUT.read_text())} or {})
    todo = argv[1:] or [n for n in ROWS if n not in rows
                        or "error" in rows[n]]
    for name in todo:
        print(f"[bench_rows] {name} ...", flush=True)
        rows[name] = run_row(name, ROWS[name])
        val = rows[name].get("value", rows[name].get("error", "?"))
        print(f"[bench_rows] {name}: {val}", flush=True)
        # keep ROWS declaration order in the artifact
        ordered = [rows[n] for n in ROWS if n in rows]
        OUT.write_text(json.dumps(ordered, indent=1) + "\n")
    print(f"[bench_rows] wrote {OUT}")


if __name__ == "__main__":
    main(sys.argv)

"""Render docs/perf_rows_r05.json as the BENCHMARK.md markdown cost table.

Mirrors the reference's cost framing (``docs/BENCHMARK_NVIDIA.md:148-150``:
default ~87 A100-GPU-s/view; +TAPIR ~2.5x; +CoTracker ~10 days/5 days ~2x
TAPIR) with measured TPU chip-s/view per configuration family.

Usage: python scripts/render_perf_table.py [path]
"""

import json
import pathlib
import sys

LABELS = {
    "flagship_warm": "flagship fast preset (no dyn mask)",
    "exact": "exact sampler (--perf-preset exact)",
    "masked_fast": "masked attention, fast preset (reference `default`)",
    "masked_exact_flax": "masked attention, exact sampler (flax path)",
    "fine64": "fine importance sampling (256 coarse + 64 fine)",
    "track_lk": "+ tracking, Lucas-Kanade stand-in",
    "track_tapir": "+ tracking, TAPIR (random weights)",
    "pure_geo": "pure-geometry static branch (st_cvd_*)",
    "rt4096": "perf experiment: ray_tile=4096",
    "rb8_pkv1": "perf experiment: rb=8 + precomputed k/v",
}


def main(argv):
    path = pathlib.Path(argv[1] if len(argv) > 1 else "docs/perf_rows_r05.json")
    rows = json.loads(path.read_text())
    print("| configuration | chip-s/view | vs 87 GPU-s baseline | compile_s | track_s/view |")
    print("|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {LABELS.get(r['row'], r['row'])} | ERROR | | | |")
            continue
        e = r.get("extra", {})
        track = e.get("track_s_per_view")
        total = (
            f"{r['value'] + track:.2f} (render {r['value']:.2f} + track {track:.2f})"
            if track is not None
            else f"{r['value']:.2f}"
        )
        vsb = 87.0 / (r["value"] + (track or 0.0))
        print(
            f"| {LABELS.get(r['row'], r['row'])} | {total} | {vsb:.1f}x |"
            f" {e.get('compile_s', '?')} | {track if track is not None else '—'} |"
        )


if __name__ == "__main__":
    main(sys.argv)

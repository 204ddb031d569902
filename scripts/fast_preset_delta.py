"""Quantify the fast-preset vs exact-sampler image delta (VERDICT r4 item 2).

Renders the SAME bench-scale synthetic novel view (288x550, 10 source
views, 256 samples — the bench.py scene) through the full pipeline with:

  exact    : reference-faithful sampler (epipolar_mode='exact'), the
             pre-round-5 production default
  flagship : apply_perf_preset with gnt_use_dyn_mask=False — mono4 +
             full fold set + patch 4x2 gather (the bench.py program)
  masked   : apply_perf_preset with gnt_use_dyn_mask=True — mono3 + quad
             + ray-diff/pos-code folds (the masked-attention bundles)

and reports f32 PSNR/SSIM of each fast render against its exact
counterpart, plus each mode's PSNR against the scene's rendered ground
truth (the metric a user actually optimizes). One JSON line, recorded in
docs/BENCHMARK.md.

Context for reading the numbers: 'fast vs exact' is NOT kernel error (the
fused kernels are parity-tested to bf16 rounding — tests/test_gnt_fused.py);
it is the fused-map sampling approximation (features pre-upsampled to full
res once per image, then ONE bilinear tap per sample/view instead of the
exact sampler's separate full-res rgb + quarter-res feature taps). On
band-limited natural images the two interpolations nearly commute; the
worst case is white noise (~0.5 max channel delta on uniform-noise
sources, tests/test_gnt_model.py tolerances).

Run on the TPU chip: python scripts/fast_preset_delta.py
(compiles 3 programs; expect ~10-20 min total, dominated by compiles).
"""

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


def psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def ssim(a, b):
    from pgdvs_tpu.metrics.psnr_ssim import masked_ssim

    m = np.ones(a.shape[:2] + (1,), np.float32)
    return float(masked_ssim(a, b, m, data_range=1.0) / 3.0)  # [0,1] renders;
    # masked_ssim sums the 3-channel map against the broadcast mask


def main():
    from pgdvs_tpu.data.synthetic import make_contract_data
    from pgdvs_tpu.renderers.compose import render_novel_view
    from pgdvs_tpu.renderers.config import RenderConfig, apply_perf_preset
    from pgdvs_tpu.renderers.static_gnt import init_gnt_params, make_gnt_models

    h, w = (288, 550) if os.environ.get("DELTA_SMALL", "0") != "1" else (48, 80)
    n_src = 10
    n_coarse = int(os.environ.get("DELTA_N_COARSE", "256"))
    data = make_contract_data(h=h, w=w, n_spatial=n_src, n_frames=12, tgt_time=0.5)
    gt = np.asarray(data["rgb_tgt"], np.float32)
    dev_data = {
        k: jnp.asarray(v) for k, v in data.items() if not isinstance(v, (dict, str))
    }

    only = os.environ.get("DELTA_MODE", "")
    if only == "aggregate":
        # cross-mode deltas from .npy renders saved by prior single-mode
        # runs (crash isolation on the tunneled chip: one program crashing
        # the TPU worker must not void the other modes' renders). Pure
        # host-side numpy — no device work.
        save = os.environ.get("DELTA_SAVE_DIR", "")
        names = ("exact", "flagship", "masked_exact", "masked_exact_flax",
                 "masked_fast")
        renders = {
            name: np.load(os.path.join(save, f"delta_{name}.npy"))
            for name in names
            if os.path.exists(os.path.join(save, f"delta_{name}.npy"))
        }
        if "masked_exact" not in renders and "masked_exact_flax" in renders:
            # the pallas masked-exact program faults the TPU worker (see
            # STATUS.md); the flax render is the same numerics (kernel
            # parity-tested) and stands in as the masked baseline
            renders["masked_exact"] = renders["masked_exact_flax"]
        print(json.dumps(_report(renders, gt, {}, h, w, n_src, n_coarse)))
        return

    models = make_gnt_models()
    params = jax.block_until_ready(
        jax.jit(lambda k: init_gnt_params(k, *models, n_src=n_src))(
            jax.random.PRNGKey(0)
        )
    )

    base = dict(
        n_coarse_samples_per_ray=n_coarse,
        sample_inv_uniform=True,
        gnt_use_masked_spatial_src=True,
        ray_tile=2048,
    )
    modes = {
        "exact": RenderConfig(**base, epipolar_mode="exact"),
        "flagship": apply_perf_preset(RenderConfig(**base)),
        "masked_exact": RenderConfig(**base, gnt_use_dyn_mask=True,
                                     epipolar_mode="exact"),
        # flax fallback of the same numerics (the kernel is parity-tested
        # bit-wise): used as the masked baseline because the mono3+exact+
        # mask program faults the TPU worker at bench scale (see STATUS.md)
        "masked_exact_flax": RenderConfig(
            **base, gnt_use_dyn_mask=True, epipolar_mode="exact",
            use_pallas_gnt=False,
        ),
        "masked_fast": apply_perf_preset(
            RenderConfig(**base, gnt_use_dyn_mask=True)
        ),
    }

    if only:
        modes = {only: modes[only]}
    renders, timings = {}, {}
    for name, cfg in modes.items():
        print(f"[delta] compiling+rendering mode={name}", file=sys.stderr,
              flush=True)
        fn = jax.jit(
            lambda p, d, k, cfg=cfg: render_novel_view(
                models, p, d, cfg, k, static_mode="gnt"
            )
        )
        t0 = time.time()
        out = fn(params, dev_data, jax.random.PRNGKey(0))
        _ = float(jnp.sum(out["combined_rgb"]))  # forces execution (tunnel)
        compile_s = time.time() - t0
        t0 = time.time()
        out = fn(params, dev_data, jax.random.PRNGKey(0))
        _ = float(jnp.sum(out["combined_rgb"]))
        timings[name] = {
            "compile_s": round(compile_s, 1),
            "render_s": round(time.time() - t0, 3),
        }
        renders[name] = np.asarray(out["combined_rgb"], np.float32)
        print(f"[delta] mode={name} done {timings[name]}", file=sys.stderr,
              flush=True)
        save = os.environ.get("DELTA_SAVE_DIR", "")
        if save:
            np.save(os.path.join(save, f"delta_{name}.npy"), renders[name])

    if only:
        # single-mode run (crash isolation): renders were saved; the
        # aggregating caller computes the cross-mode deltas from the .npy
        # files once all modes have run
        print(json.dumps({"mode": only, "timings": timings[only]}))
        return

    print(json.dumps(_report(renders, gt, timings, h, w, n_src, n_coarse)))


def _delta_entry(a, b):
    return {
        "psnr_db": round(psnr(a, b), 2),
        "ssim": round(ssim(a, b), 5),
        "max_abs": round(float(np.abs(a - b).max()), 5),
    }


def _report(renders, gt, timings, h, w, n_src, n_coarse):
    return {
        "metric": "fast_preset_vs_exact_image_delta",
        "scene": f"synthetic {h}x{w}, {n_src} src, {n_coarse} samples",
        "flagship_vs_exact": _delta_entry(
            renders["flagship"], renders["exact"]
        ),
        "masked_fast_vs_masked_exact": _delta_entry(
            renders["masked_fast"], renders["masked_exact"]
        ),
        "psnr_to_gt_db": {
            name: round(psnr(r, gt), 3) for name, r in renders.items()
        },
        "timings": timings,
    }


if __name__ == "__main__":
    sys.exit(main())

"""Render configuration — the framework's feature-flag surface.

Mirrors the reference's ``render_cfg`` block
(``/root/reference/configs/engine/evaluator_pgdvs.yaml:11-48``) field for
field, plus TPU-specific capacity knobs (ray tile size, point capacities)
that turn the reference's dynamic host-side chunking into static shapes.

Frozen + hashable so it can be a ``jax.jit`` static argument: changing a
field recompiles, which is exactly the reference's ablation semantics (its 17
benchmark_type bundles are compile-time variants here).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    # --- image / ray sampling -------------------------------------------
    render_stride: int = 1
    sample_inv_uniform: bool = True
    n_coarse_samples_per_ray: int = 256
    n_fine_samples_per_ray: int = 0

    # --- static (GNT) branch --------------------------------------------
    pure_gnt: bool = False
    pure_gnt_with_dyn_mask: bool = False
    gnt_use_dyn_mask: bool = False         # masked view attention
    gnt_use_masked_spatial_src: bool = True  # feed static-only source rgb
    mask_oob_n_proj_thres: int = 1
    mask_invalid_n_proj_thres: int = 4

    # --- static point-cloud branch (pure-geometry ablations) -------------
    st_pcl_remove_outlier: bool = False
    st_pcl_outlier_knn: int = 50
    st_pcl_outlier_std_thres: float = 0.1
    st_render_pcl_pt_radius: float = 0.01
    st_render_pcl_pts_per_pixel: int = 1

    # --- dynamic branch ---------------------------------------------------
    dyn_pcl_remove_outlier: bool = False
    dyn_pcl_outlier_knn: int = 50
    dyn_pcl_outlier_std_thres: float = 0.1
    dyn_render_type: str = "softsplat"  # softsplat | pcl | mesh
    dyn_render_pcl_pt_radius: float = 0.01
    dyn_render_pcl_pts_per_pixel: int = 1
    dyn_render_track_temporal: str = "none"  # none | no_tgt
    dyn_pcl_track_track2base_thres_mult: float = 50.0
    dyn_render_use_flow_consistency: bool = False
    softsplat_metric_abs_alpha: float = 100.0

    # --- TPU capacity knobs (static shapes) ------------------------------
    ray_tile: int = 2048           # rays per scan tile in the GNT render
    use_pallas_gnt: bool = True    # fused single-VMEM-pass GNT transformer
    #                                kernel (kernels/gnt_fused.py); False =
    #                                plain XLA flax apply (also used whenever
    #                                view-std diagnostics are requested)
    pallas_ray_block: int = 4      # rays per fused-kernel grid step
    pallas_kernel: str = "mono4"   # 'mono4': 128-lane sample-pair packing +
    #                                composed attention chains (fastest;
    #                                requires the full fold set + s%16==0 and
    #                                silently runs mono3 otherwise);
    #                                'mono3': 64-lane kernel with cross-block
    #                                width-folded k/v/pos projections — the
    #                                general fallback (dyn-mask, fine counts,
    #                                partial fold sets; compiles ~4-5 min);
    #                                'split': per-block view/ray kernels
    #                                (compiles in seconds; ~1.4x slower).
    #                                mono/mono2 (earlier generations, retired
    #                                round 4): mono was runtime-equal to
    #                                mono3 but cold-compiled in ~20 min
    pallas_fold_ray_diff: bool = False  # mono3/mono4: compute the ray-diff
    #                                code inside the kernel (skips the XLA
    #                                [V, R, S, 4] materialization)
    pallas_fold_pos_code: bool = False  # mono3 (+fold_ray_diff): build the
    #                                pts positional embedding in-kernel from
    #                                the streamed sample positions (skips
    #                                the [R, S, 126] bf16 HBM stream)
    pallas_fold_lerp: bool = False  # mono3 (+fold_ray_diff, quad maps, no
    #                                dyn mask): stream RAW gathered quad
    #                                rows + fractional offsets and do the
    #                                bilinear combine in-kernel (the
    #                                [V, R, S, C] lerp output never exists
    #                                in HBM). Measured SLOWER at bench
    #                                scale: the [*, 4C] rows force
    #                                ray_tile<=2048 for HBM capacity and
    #                                the extra tiles cost more than the
    #                                saved lerp pass (21.5 vs 19.3 s/view)
    pallas_fold_mask: bool = False  # mono3 (+fold_ray_diff, flattened quad
    #                                maps, no dyn mask): NO mask operand —
    #                                the kernel recomputes inbound&in-front
    #                                validity from pts + per-view K@w2c rows
    #                                and the sampler skips the [V, R, S, 1]
    #                                mask build (a pathological-layout
    #                                ~1.6 s/view fusion chain at bench scale).
    #                                Caveat: a tap whose uv lands EXACTLY on
    #                                the image border (only happens under
    #                                self-projection, i.e. target == a source
    #                                view — never the case in the eval
    #                                protocols) may flip validity by 1 ulp vs
    #                                the XLA-side mask
    pallas_ablate: str = ""        # perf-bisection only (mono4): skip kernel
    #                                stages in situ ('min' | 'noview' |
    #                                'noray' | 'nofold') to attribute e2e
    #                                render time; "" = full
    pallas_precompute_kv: bool = True  # mono4: precompute all-blocks k/v/pos
    #                                as 3 wide [n, D*128] matmuls (VMEM-heavy;
    #                                right for ray_block<=4) vs per-block
    #                                slices (1/DEPTH the residency — required
    #                                for ray_block>=8 to fit VMEM)
    epipolar_mode: str = "exact"   # 'exact'|'fused'|'quad'|'quad_i8'|'patch'
    #   Default is the reference-faithful sampler so evaluation numerics
    #   match the reference by default; bench/perf configs opt into 'quad'
    #   (bench.py sets it explicitly).
    #   exact: reference-exact sampling (separate full-res rgb + quarter-res
    #          feature bilinear lookups; 8 gather rows per sample/view)
    #   fused: rgb+feat(+mask) packed into one pre-upsampled per-view map
    #          (4 gather rows; features double-interpolated)
    #   quad:  fused map with the 2x2 bilinear stencil packed into channels
    #          (ONE gather row per sample/view; ~5x faster sampling measured
    #          at benchmark scale, scripts/gather_exp3.py; 4x map memory)
    #   quad_i8: quad with per-channel int8 maps (2x smaller gather rows;
    #          quantization sits below the network's bf16 precision)
    #   patch: quad values from ONE patch row per (ray block, sample,
    #          view) — 4-8x fewer gather rows (FlatPatchMaps docstring);
    #          requires the fused-kernel fold path (mono3/4 +
    #          fold_ray_diff/pos_code/mask, no dyn mask) and falls back to
    #          'quad' with a warning otherwise
    pallas_patch_block: str = "2x2"  # patch ray-block geometry:
    #   '2x2': 4 rays share a 4x4-pixel row (4x fewer gather rows)
    #   '4x2': 8 rays share a 6x4-pixel row (8x fewer; requires mono4 +
    #          render height % 4 == 0, falls back to '2x2' loudly)
    dyn_point_capacity: int = 0    # max dynamic points kept for the pcl
    #                                rasterizer / KNN / track branch (0 =
    #                                dense H*W buffer); compaction via
    #                                fixed-size nonzero gather
    track_queries_per_frame: int = 0  # tracker query capacity per tracking
    #                                frame. 0 = every pixel (H*W) — the
    #                                reference tracks ALL dyn-mask pixels
    #                                (pgdvs_renderer_dyn_track.py:480-488),
    #                                so the faithful default can never drop
    #                                a trackable point; >0 caps capacity
    #                                (dyn pixels selected first) to trade
    #                                recall on very large dynamic regions
    #                                for tracker cost
    knn_tile: int = 2048

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_EVAL_CONFIG = RenderConfig()


def apply_perf_preset(cfg: RenderConfig) -> RenderConfig:
    """Fill the TPU perf knobs with the fastest SERVICEABLE values for
    ``cfg``'s semantic flags — the production default since round 5, so the
    benchmarked speed is what ``run.py eval``/``benchmark`` actually compile
    (the reference has no exact/fast split: its one sampler is what its 87
    GPU-s/view baseline measures).

    Only kernel-strategy knobs are touched; every semantic flag (masks,
    branches, sample counts, protocols) is preserved, and numerics stay
    within bf16 rounding of the exact sampler (tests/test_gnt_fused.py
    parity suite + the e2e delta in docs/BENCHMARK.md). Callers apply
    explicit user overrides AFTER this, so ``--render-cfg
    epipolar_mode=exact`` (or ``--perf-preset exact``) restores the
    reference-faithful sampler.

    - no dyn mask: the flagship path — mono4 fused kernel (128-lane
      sample-pair packing, composed attention chains), full fold set, patch
      epipolar gather on 4x2 ray blocks (8x fewer gather rows). Measured
      8.55 chip-s/view at bench scale (BENCH_r04). Unserviceable geometries
      (odd render dims, tile mismatches) fall back loudly via
      resolve_epipolar_cfg.
    - masked view attention (gnt_use_dyn_mask): the patch/fold_mask path
      cannot carry a dyn mask, so: mono3 kernel + quad gather (one row per
      sample/view) + ray-diff/pos-code folds, which all compose with masks.
    """
    if cfg.gnt_use_dyn_mask:
        return cfg.replace(
            epipolar_mode="quad",
            pallas_kernel="mono3",
            pallas_fold_ray_diff=True,
            pallas_fold_pos_code=True,
        )
    return cfg.replace(
        epipolar_mode="patch",
        pallas_patch_block="4x2",
        pallas_kernel="mono4",
        # rb=8: both quads of a 4x2 patch block share one grid step —
        # 8.30 vs rb=4's 8.55 chip-s/view at bench scale (round 5); needs
        # per-block k/v slicing (pkv off) + a raised scoped-VMEM budget on
        # TPU backends (compiler_options_for)
        pallas_ray_block=8,
        pallas_precompute_kv=False,
        pallas_fold_ray_diff=True,
        pallas_fold_pos_code=True,
        pallas_fold_mask=True,
    )


def compiler_options_for(cfg: RenderConfig, platform: str = None):
    """Per-jit XLA compiler options ``cfg``'s kernel path needs, or None.

    mono4 at ray_block>=8 keeps ~72 MiB of kernel state + double-buffered
    operands in scoped VMEM at bench scale (288x550, 256 samples); XLA's
    default scoped-VMEM budget (~18 MiB on this backend) refuses to compile
    it ("exceeded scoped vmem limit"). The raised budget is a TPU-only XLA
    flag: it must reach every ``jax.jit`` that can compile this program
    (evaluator / visualizer / sharded eval / bench) and must NOT be passed
    on CPU backends, whose XLA rejects unknown tpu flags at parse time —
    hence the platform gate (the virtual-mesh test lane runs on CPU, where
    pallas interprets the kernel and no budget applies).
    """
    if platform is None:
        import jax

        platform = jax.devices()[0].platform
    if (
        platform == "tpu"
        and cfg.use_pallas_gnt
        and cfg.pallas_kernel == "mono4"
        and cfg.pallas_ray_block >= 8
    ):
        return {"xla_tpu_scoped_vmem_limit_kib": 98304}
    return None

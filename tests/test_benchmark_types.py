"""Benchmark-bundle smoke + name-coverage vs the reference's benchmark.sh.

Every named ``benchmark_type`` the reference driver accepts
(``/root/reference/scripts/benchmark.sh:56-269``) must resolve here too,
and every bundle must produce a constructible RenderConfig (catching
typo'd field names at test time instead of CLI time) with a registered
dataset lane.
"""

import pathlib
import re

import pytest

REF_SH = pathlib.Path("/root/reference/scripts/benchmark.sh")


def _reference_names():
    try:
        txt = REF_SH.read_text()
    except OSError as e:
        pytest.skip(f"reference benchmark.sh unavailable: {e}")
    return sorted(set(re.findall(r'RUN_TYPE\}" == "([a-z0-9_]+)"', txt)))


def test_all_reference_benchmark_types_resolve():
    from pgdvs_tpu.configs.benchmarks import BENCHMARK_TYPES

    ref_names = _reference_names()
    assert len(ref_names) >= 17
    missing = [n for n in ref_names if n not in BENCHMARK_TYPES]
    assert not missing, f"reference benchmark types not covered: {missing}"


def test_every_bundle_builds_a_render_config():
    from pgdvs_tpu.configs.benchmarks import BENCHMARK_TYPES, resolve_benchmark
    from pgdvs_tpu.data.combined import DATASET_REGISTRY, _populate
    from pgdvs_tpu.renderers.config import RenderConfig

    _populate()
    for name in sorted(BENCHMARK_TYPES):
        cfg, spec = resolve_benchmark(name)
        assert isinstance(cfg, RenderConfig), name
        ds_name = spec.get("dataset", "nvidia_eval")
        assert ds_name in DATASET_REGISTRY, (name, ds_name)


def test_perf_preset_picks_fastest_serviceable_path():
    """resolve_benchmark defaults to the fast preset (VERDICT r4: the
    benchmarked configuration must be what the production CLI compiles):
    bundles without masked attention get the flagship mono4+patch path;
    masked-attention bundles get the mask-composable mono3+quad+folds path;
    preset='exact' restores the reference-faithful sampler; and the preset
    never touches a bundle's semantic flags."""
    import dataclasses

    from pgdvs_tpu.configs.benchmarks import BENCHMARK_TYPES, resolve_benchmark
    from pgdvs_tpu.renderers.config import RenderConfig

    SEMANTIC = {
        f.name
        for f in dataclasses.fields(RenderConfig)
        if not f.name.startswith(("pallas_", "epipolar_"))
        and f.name not in ("use_pallas_gnt", "ray_tile", "knn_tile")
    }

    flagship, _ = resolve_benchmark("st_gnt_masked_input_dy_cvd_pcl_clean")
    assert flagship.epipolar_mode == "patch"
    assert flagship.pallas_kernel == "mono4"
    assert flagship.pallas_fold_mask

    masked, _ = resolve_benchmark("default")
    assert masked.gnt_use_dyn_mask
    assert masked.epipolar_mode == "quad"  # fold_mask/patch can't carry masks
    assert masked.pallas_kernel == "mono3"
    assert masked.pallas_fold_ray_diff and masked.pallas_fold_pos_code
    assert not masked.pallas_fold_mask

    for name in sorted(BENCHMARK_TYPES):
        fast, _ = resolve_benchmark(name, preset="fast")
        exact, _ = resolve_benchmark(name, preset="exact")
        assert exact.epipolar_mode == "exact", name
        for f in SEMANTIC:
            assert getattr(fast, f) == getattr(exact, f), (name, f)

    with pytest.raises(KeyError):
        resolve_benchmark("default", preset="turbo")


def test_flagship_preset_rb8_and_compiler_options_gating():
    """The round-5 flagship preset runs the rb=8 grid (both quads of a 4x2
    patch block share one step — 8.30 vs rb=4's 8.55 chip-s/view) with
    per-block k/v slicing, and compiler_options_for supplies the raised
    scoped-VMEM budget that program needs on TPU backends ONLY — CPU XLA
    rejects unknown tpu flags at parse time, so the virtual-mesh test lane
    must see None."""
    from pgdvs_tpu.renderers.config import (
        RenderConfig,
        apply_perf_preset,
        compiler_options_for,
    )

    flagship = apply_perf_preset(RenderConfig())
    assert flagship.pallas_ray_block == 8
    assert not flagship.pallas_precompute_kv
    assert compiler_options_for(flagship, platform="tpu") == {
        "xla_tpu_scoped_vmem_limit_kib": 98304
    }
    assert compiler_options_for(flagship, platform="cpu") is None
    # this test lane runs on CPU: the backend-derived default must gate off
    assert compiler_options_for(flagship) is None

    # rb=4 and the masked (mono3) preset fit XLA's default budget
    assert compiler_options_for(
        flagship.replace(pallas_ray_block=4), platform="tpu"
    ) is None
    masked = apply_perf_preset(RenderConfig(gnt_use_dyn_mask=True))
    assert masked.pallas_ray_block == 4
    assert compiler_options_for(masked, platform="tpu") is None


def test_cli_render_cfg_overrides_win_over_preset():
    """--render-cfg flags are applied AFTER the perf preset, so any knob —
    including epipolar_mode=exact — opts back out of it."""
    import argparse

    import run as run_mod
    from pgdvs_tpu.renderers.config import RenderConfig

    args = argparse.Namespace(
        perf_preset="fast",
        render_cfg=["epipolar_mode=exact", "pallas_fold_mask=0"],
    )
    cfg = run_mod.build_render_config(args)
    assert cfg.epipolar_mode == "exact"
    assert not cfg.pallas_fold_mask
    assert cfg.pallas_fold_ray_diff  # untouched preset knobs persist

    args_exact = argparse.Namespace(perf_preset="exact", render_cfg=[])
    assert run_mod.build_render_config(args_exact) == RenderConfig()

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

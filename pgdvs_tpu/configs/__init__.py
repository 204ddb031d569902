from pgdvs_tpu.configs.benchmarks import BENCHMARK_TYPES, resolve_benchmark  # noqa: F401

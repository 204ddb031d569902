from pgdvs_tpu.core import cameras, geometry, interpolate, sampling  # noqa: F401

from pgdvs_tpu.renderers.config import RenderConfig  # noqa: F401

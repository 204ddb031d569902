from pgdvs_tpu.data.contract import RENDER_CONTRACT_KEYS  # noqa: F401

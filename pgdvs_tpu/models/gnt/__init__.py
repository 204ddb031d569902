from pgdvs_tpu.models.gnt.feature_net import ResUNet  # noqa: F401
from pgdvs_tpu.models.gnt.network import GNT  # noqa: F401

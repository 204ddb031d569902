"""Optical-flow models (preprocessing stack).

``raft.RAFT`` — flax port of the reference's flow backbone
(``compute_flow.py:221-238``); ``raft_port`` loads raft-things.pth.
"""

from pgdvs_tpu.models.flow.raft import RAFT, RAFTFlow  # noqa: F401
from pgdvs_tpu.models.flow.raft_port import load_raft_checkpoint  # noqa: F401

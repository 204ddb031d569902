"""Device mesh construction.

The reference's only multi-device strategy is eval data parallelism over
NCCL (``/root/reference/pgdvs/run.py:119-176``). The TPU-native design
expresses all scaling through a `jax.sharding.Mesh`:

  * axis ``dp`` — data parallel over novel views (the reference's DP);
  * axis ``rp`` — ray parallel *within* a view (the TPU upgrade of the
    reference's host-side ray chunking: rays are embarrassingly parallel,
    so one view can fan out across chips over ICI).

Collectives (psum for metrics/grads, all_gather for ray results) are
inserted by XLA from sharding annotations — no hand-written comm layer.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    rp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, rp) mesh over the available devices.

    Args:
      n_devices: total devices to use (default: all).
      dp: data-parallel extent (default: n_devices // rp).
      rp: ray-parallel extent.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if dp is None:
        if n % rp != 0:
            raise ValueError(f"{n} devices not divisible by rp={rp}")
        dp = n // rp
    if dp * rp != n:
        raise ValueError(f"dp({dp}) * rp({rp}) != n_devices({n})")
    arr = np.asarray(devs).reshape(dp, rp)
    return Mesh(arr, axis_names=("dp", "rp"))

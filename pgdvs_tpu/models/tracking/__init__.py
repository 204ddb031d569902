"""Point trackers.

The tracker contract (shared by every implementation):

  track(frames [T, H, W, 3], queries [N, 3] (t, x, y), query_valid [N])
      -> tracks [N, T, 2] (x, y), visibles [N, T] bool

matching the reference's TAPIR/CoTracker interface outputs
(``/root/reference/pgdvs/models/tapnet/interface.py:63-119``).

Implementations:
  * ``lk.LucasKanadeTracker`` — classical pyramidal Lucas-Kanade chaining,
    pure jnp, no weights; forward-backward + photometric visibility.
  * ``tapir`` — TAPIR architecture (weight-ported); see tapir.py.
"""

from pgdvs_tpu.models.tracking.lk import LucasKanadeTracker  # noqa: F401
from pgdvs_tpu.models.tracking.cotracker import (  # noqa: F401
    CoTrackerModel,
    CoTrackerTracker,
)

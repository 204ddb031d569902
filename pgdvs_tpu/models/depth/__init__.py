"""Metric mono-depth models (preprocessing stack).

``zoe_head`` — ZoeDepth's metric-bins computation structure (seed bins,
inverse attractors, conditional log-binomial) over a pluggable
relative-depth backbone; the external MiDaS DPT backbone stays a
precomputed input until its checkpoint can be provisioned and ported.
"""

from pgdvs_tpu.models.depth.zoe_head import (  # noqa: F401
    MetricBinsHead,
    ZoeDepthModel,
)

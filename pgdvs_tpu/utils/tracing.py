"""Tracing / profiling / metric logging.

The reference has none of this (SURVEY.md §5.1 — tqdm bars only); per the
rebuild's perf-first goal this module adds:

  * `profile_trace` — jax.profiler trace context (view in TensorBoard or
    xprof; works on TPU and CPU);
  * `StageTimer` — named wall-clock stage accumulator with device sync;
  * `MetricLogger` — append-only JSONL metric stream (the portable
    equivalent of the reference's TensorBoard scalars,
    ``trainer_pgdvs.py:249-253``) with optional TensorBoard mirroring when
    the package is importable.
"""

from __future__ import annotations

import contextlib
import json
import pathlib
import time
from collections import defaultdict
from typing import Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulate wall time per named stage (device-synced at stage end)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.time()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_s": round(self.totals[name] / max(self.counts[name], 1), 4),
            }
            for name in self.totals
        }


class MetricLogger:
    """JSONL metric stream + optional TensorBoard mirror."""

    def __init__(self, log_dir, use_tensorboard: bool = True):
        self.dir = pathlib.Path(log_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._f = open(self.dir / "metrics.jsonl", "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(self.dir / "tb"))
            except ImportError:
                pass

    def log(self, step: int, **scalars):
        rec = {"step": step, "time": time.time(), **scalars}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()

"""Profiling / tracing utilities.

The reference has no profiling at all (SummaryWriter is imported defensively
and never used, reference: src/run.py:16-19; SURVEY.md §5.1). Here:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory (device timelines, HLO, memory);
  wired to ``--trace_dir`` on the train CLI and ``bench.py``,
* :class:`StepTimer` — cheap wall-clock timing with percentile summary;
  ``Trainer.fit`` uses it for per-step dispatch-time percentiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace: ``with trace('/tmp/trace'): step()``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timing with a skip-warmup window and percentiles."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._all: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._all.append(time.perf_counter() - self._t0)
        self._t0 = None

    @property
    def times(self) -> List[float]:
        return self._all[self.warmup:] if len(self._all) > self.warmup else self._all

    def summary(self) -> Dict[str, float]:
        import numpy as np

        ts = np.asarray(self.times, dtype=float)
        if ts.size == 0:  # nothing ran: report 0 steps, not a phantom one
            nan = float("nan")
            return {"steps": 0, "mean_s": nan, "p50_s": nan, "p95_s": nan,
                    "steps_per_sec": 0.0,
                    # True when the only samples available include jit
                    # compiles (fewer post-warmup steps than warmup).
                    "includes_warmup": len(self._all) > 0}
        return {
            "steps": int(ts.size),
            "mean_s": float(ts.mean()),
            "p50_s": float(np.percentile(ts, 50)),
            "p95_s": float(np.percentile(ts, 95)),
            "steps_per_sec": float(1.0 / ts.mean()) if ts.mean() > 0 else 0.0,
            "includes_warmup": len(self._all) <= self.warmup,
        }

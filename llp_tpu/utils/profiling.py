"""Observability: step timing, throughput counters, and jax.profiler hooks.

The reference has no tracing at all (SURVEY.md §5.1 — ``import time`` unused,
a dead nvidia-smi probe).  Here: a lightweight epoch clock that reports
epochs/sec and edges-scored/sec (the BASELINE metric), plus an optional
``jax.profiler`` trace context for deep dives (view with TensorBoard or
xprof).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class ThroughputMeter:
    """Accumulates wall-clock + work counters across epochs."""

    edges_per_epoch: int = 0
    _t0: Optional[float] = None
    epoch_times: List[float] = field(default_factory=list)
    # Windows whose wall-clock included XLA compilation (first call of an
    # epoch/block/eval program) — counted in totals, excluded from
    # steady-state throughput. The driver flags them explicitly.
    excluded_times: List[float] = field(default_factory=list)

    def start_epoch(self) -> None:
        self._t0 = time.perf_counter()

    def end_epoch(self, n_epochs: int = 1, *, exclude: bool = False) -> None:
        """Close the timing window; ``n_epochs > 1`` when a fused multi-epoch
        program ran (records the per-epoch average n times).  ``exclude``
        keeps the window out of the steady-state mean (compile-bearing)."""
        if self._t0 is not None:
            n = max(n_epochs, 1)
            dt = (time.perf_counter() - self._t0) / n
            (self.excluded_times if exclude else self.epoch_times).extend([dt] * n)
            self._t0 = None

    @property
    def mean_epoch_s(self) -> float:
        ts = self.epoch_times or self.excluded_times
        if not ts:
            return 0.0
        return sum(ts) / len(ts)

    @property
    def edges_per_sec(self) -> float:
        t = self.mean_epoch_s
        return self.edges_per_epoch / t if t > 0 else 0.0

    def summary(self) -> dict:
        return {
            "epochs": len(self.epoch_times) + len(self.excluded_times),
            "mean_epoch_s": round(self.mean_epoch_s, 4),
            "edges_per_sec": round(self.edges_per_sec, 1),
        }


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

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
    # Epochs whose wall-clock includes compilation (the driver sets this to
    # its epochs_per_jit block size — a fused block spreads its compile time
    # over the whole block, not just the first epoch).
    compile_epochs: int = 1
    _t0: Optional[float] = None
    epoch_times: List[float] = field(default_factory=list)

    def start_epoch(self) -> None:
        self._t0 = time.perf_counter()

    def end_epoch(self, n_epochs: int = 1) -> None:
        """Close the timing window; ``n_epochs > 1`` when a fused multi-epoch
        program ran (records the per-epoch average n times)."""
        if self._t0 is not None:
            dt = (time.perf_counter() - self._t0) / max(n_epochs, 1)
            self.epoch_times.extend([dt] * max(n_epochs, 1))
            self._t0 = None

    @property
    def mean_epoch_s(self) -> float:
        if not self.epoch_times:
            return 0.0
        # Skip the compile-bearing prefix when there are enough samples.
        skip = max(self.compile_epochs, 1)
        ts = (
            self.epoch_times[skip:]
            if len(self.epoch_times) > 2 * skip
            else self.epoch_times
        )
        return sum(ts) / len(ts)

    @property
    def edges_per_sec(self) -> float:
        t = self.mean_epoch_s
        return self.edges_per_epoch / t if t > 0 else 0.0

    def summary(self) -> dict:
        return {
            "epochs": len(self.epoch_times),
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

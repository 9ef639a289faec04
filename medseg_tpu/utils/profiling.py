"""Tracing / profiling hooks (SURVEY.md §5: absent in the reference beyond
wall-clock prints; first-class here because the throughput target must be
provable).

- `trace_context`: jax.profiler trace scope writing a TensorBoard-loadable
  trace directory
- `StepTimer`: per-step wall-clock statistics with warmup discard, the
  utility behind bench.py's steady-state numbers
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]):
    """Profile the enclosed block with jax.profiler when log_dir is set."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    @property
    def steady(self) -> List[float]:
        return self.times[self.warmup:]

    def mean(self) -> float:
        s = self.steady
        return sum(s) / len(s) if s else float("nan")

    def summary(self, items_per_step: int = 1) -> str:
        m = self.mean()
        return (f"steps={len(self.times)} mean={m * 1e3:.2f}ms "
                f"throughput={items_per_step / m:.1f}/s" if self.steady
                else "no steady-state samples")

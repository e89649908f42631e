"""Profiling hooks — the tracing subsystem the reference lacks.

The reference's only instrumentation is wall-clock `ms per sample`
(`test.py:270-271`, SURVEY.md §5).  Here: the same throughput counters plus
an optional `jax.profiler` trace around any compiled region, viewable in
TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """Wrap a region in a jax profiler trace when a directory is given."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


class Throughput:
    """Accumulates (items, seconds) and reports items/sec + ms/item."""

    def __init__(self):
        self.items = 0
        self.seconds = 0.0

    @contextlib.contextmanager
    def measure(self, n: int):
        t0 = time.perf_counter()
        yield
        self.seconds += time.perf_counter() - t0
        self.items += n

    @property
    def items_per_sec(self) -> float:
        return self.items / self.seconds if self.seconds else 0.0

    @property
    def ms_per_item(self) -> float:
        return 1e3 * self.seconds / self.items if self.items else 0.0

"""Profiling / tracing utilities.

The reference's only instrumentation is clock() prints
(jly_main.cpp:108-123, jly_goicp.cpp:694-700).  Here:
  * `phase_timer` — lightweight named phase timing accumulated in a dict;
  * `trace` — wraps jax.profiler.trace for TensorBoard-viewable device
    traces of the search hot loop.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimers:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {k: {"total_s": round(v, 4), "calls": self.counts[k]}
                for k, v in sorted(self.totals.items(),
                                   key=lambda kv: -kv[1])}


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler device trace when log_dir is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield

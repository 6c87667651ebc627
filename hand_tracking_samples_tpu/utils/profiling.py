"""Per-stage timing + device tracing.

The reference has zero observability hooks (SURVEY section 5); this module is
the from-day-one replacement: host-side stage timers (device-synchronised)
and jax.profiler trace capture for xprof/tensorboard.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulating per-stage wall timers; times device work correctly by
    blocking on the stage output."""

    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name, result_fn=None):
        t0 = time.perf_counter()
        yield
        t1 = time.perf_counter()
        self.total[name] += t1 - t0
        self.count[name] += 1

    def time(self, name, fn, *args, **kw):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        out = jax.block_until_ready(out)
        self.total[name] += time.perf_counter() - t0
        self.count[name] += 1
        return out

    def report(self):
        lines = []
        for name in sorted(self.total, key=self.total.get, reverse=True):
            lines.append(f"{name:32s} {self.total[name]*1000:9.1f} ms "
                         f"({self.count[name]} calls, "
                         f"{self.total[name]/max(self.count[name],1)*1000:.2f}"
                         f" ms/call)")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace viewable in tensorboard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

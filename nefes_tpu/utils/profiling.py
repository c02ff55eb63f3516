"""Profiling hooks: jax.profiler traces + lightweight phase timers.

Replaces the reference's ad-hoc PROFILE_TIME prints and cuda-sync timer
pair (script/models/rendering.py:18,260-268; DFM_APR_refine.py:25-39)
with first-class tools: ``trace(dir)`` captures a TensorBoard-loadable
XLA trace; ``PhaseTimer`` accumulates named host-side phase wall-clock
with forced device sync.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulate wall-clock per named phase (device-synced).

    with timer.phase("render"): ...
    print(timer.report())
    """

    def __init__(self, sync: bool = True):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def phase(self, name: str, out=None):
        t0 = time.perf_counter()
        yield
        if self.sync:
            try:
                jax.effects_barrier()
            except Exception:
                pass
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name}: {t:.3f}s total, {t / n * 1e3:.2f} ms/call"
                         f" x{n}")
        return "\n".join(lines)


def start_timer():
    """Reference start_timer parity (DFM_APR_refine.py:25-32)."""
    return time.perf_counter()


def end_timer_and_print(t0: float, label: str = "") -> float:
    """Reference end_timer_and_print parity (:34-39). Returns seconds."""
    dt = time.perf_counter() - t0
    mem = ""
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            mem = f"  peak HBM: {stats['peak_bytes_in_use'] / 2**30:.2f} GiB"
    except Exception:
        pass
    print(f"Total execution time = {dt:.3f} sec {label}{mem}", flush=True)
    return dt

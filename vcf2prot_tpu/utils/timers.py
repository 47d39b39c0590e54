"""Stage timers.

The reference's only profiling is chrono timestamps printed at stage
boundaries under ``-v`` (reference: src/main.rs:17-60). This provides the same
verbose timeline plus accumulated per-stage durations for the bench harness,
and an optional hook into the JAX profiler for device traces.
"""
from __future__ import annotations

import contextlib
import time
from datetime import datetime, timezone


class StageTimer:
    def __init__(self, verbose: bool = False):
        self.verbose = verbose
        self.durations: dict = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        if self.verbose:
            print(f"{name}, starting time is: {datetime.now(timezone.utc)}")
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.durations[name] = self.durations.get(name, 0.0) + dt
            if self.verbose:
                print(
                    f"{name}, finished at: {datetime.now(timezone.utc)} "
                    f"({dt:.3f}s)"
                )


@contextlib.contextmanager
def jax_trace(logdir: str = None):
    """Optional JAX profiler trace around a block (no-op when logdir=None)."""
    if not logdir:
        yield
        return
    import jax

    with jax.profiler.trace(logdir):
        yield

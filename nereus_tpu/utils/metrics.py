"""Runtime metrics: throughput meter and optional profiler traces.

The reference's only runtime measurement is an FPS counter in the window
title (``main.cpp:477-494``). Here: a particle-steps/sec meter (the BASELINE
metric) plus a hook into ``jax.profiler`` for real TPU traces — the analogue
of building with ``-lineinfo`` for nvprof (``CMakeLists.txt:85``).
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepMeter:
    """Counts simulation steps and reports particle-steps/sec.

    Call :meth:`tick` once per completed step (after host-visible sync if an
    accurate wall-clock is needed — in steady state the async dispatch queue
    amortises this).
    """

    def __init__(self, num_particles: int, report_every: int = 100,
                 logger=None):
        self.num_particles = num_particles
        self.report_every = report_every
        self.logger = logger
        self._count = 0
        self._t0 = time.perf_counter()
        self.last_rate = 0.0          # steps/sec
        self.last_pstep_rate = 0.0    # particle-steps/sec

    def tick(self, n: int = 1):
        self._count += n
        if self._count >= self.report_every:
            t1 = time.perf_counter()
            self.last_rate = self._count / (t1 - self._t0)
            self.last_pstep_rate = self.last_rate * self.num_particles
            if self.logger is not None:
                self.logger.info(
                    "%.1f steps/s | %.3g particle-steps/s",
                    self.last_rate, self.last_pstep_rate)
            self._count = 0
            self._t0 = t1


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """``with profile_trace("/tmp/trace"):`` wraps a region in a
    ``jax.profiler`` trace (viewable in TensorBoard/XProf); no-op if None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

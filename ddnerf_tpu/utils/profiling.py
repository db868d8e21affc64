"""Profiling / tracing (SURVEY.md §5 "tracing").

The reference's only timing is ``time.time()`` around validation and
per-image renders (train_model.py:202, eval_nerf.py:103-111).  TPU-native
equivalents:

* :func:`trace` — ``jax.profiler`` trace context writing a TensorBoard-viewable
  profile (XLA op breakdown, HBM, MXU utilization);
* :class:`Throughput` — rays/sec counter, the BASELINE.json north-star metric,
  with warmup exclusion;
* :func:`annotate` — ``TraceAnnotation`` for labeling host-side phases inside
  a profile.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str, enable: bool = True):
    """Capture a jax.profiler trace under ``logdir/plugins/profile``."""
    if not enable:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """Steady-state rays/sec counter with warmup exclusion."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self._count = 0
        self._rays = 0
        self._t0 = None

    def step(self, num_rays: int) -> None:
        self._count += 1
        if self._count == self.warmup_steps:
            self._t0 = time.perf_counter()
            self._rays = 0
        elif self._count > self.warmup_steps:
            self._rays += num_rays

    @property
    def rays_per_sec(self) -> float:
        if self._t0 is None or self._rays == 0:
            return 0.0
        return self._rays / (time.perf_counter() - self._t0)

"""Tracing / profiling utilities — first-class, unlike the reference.

The reference has no profiler integration (SURVEY.md §5.1: only
commented-out wall-clock timing in `test/test_v3.py:116-126`).  Here:

* `trace(dir)`: context manager around `jax.profiler` — produces an XPlane
  trace viewable in TensorBoard/Perfetto;
* `StepTimer`: cheap per-step wall timing with device sync, aggregated
  into percentiles — the "tqdm timing" replacement that is actually
  correct under async dispatch;
* `time_fn`: one-shot timing helper used by benchmarks.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, *, host_tracer_level: int = 2):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with an explicit device barrier.

    Under JAX's async dispatch, naive `time.time()` around a step measures
    dispatch, not compute; the timer blocks on the step's outputs.
    """

    def __init__(self):
        self.samples: List[float] = []

    @contextlib.contextmanager
    def step(self, outputs=None):
        t0 = time.perf_counter()
        yield
        if outputs is not None:
            jax.block_until_ready(outputs)
        self.samples.append(time.perf_counter() - t0)

    def record(self, seconds: float) -> None:
        self.samples.append(seconds)

    def summary(self, skip_first: int = 1) -> Dict[str, float]:
        s = np.asarray(self.samples[skip_first:] or self.samples)
        return {
            'mean_ms': float(s.mean() * 1000),
            'p50_ms': float(np.percentile(s, 50) * 1000),
            'p95_ms': float(np.percentile(s, 95) * 1000),
            'steps_per_sec': float(1.0 / s.mean()),
            'n': int(len(s)),
        }


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 3) -> float:
    """Mean seconds per call with compile excluded and a final barrier."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

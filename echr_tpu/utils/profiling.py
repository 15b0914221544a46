"""Tracing / profiling harness.

The reference's only profiling is ad-hoc time.time() prints
(reference: CaptionGenerator.py:22,28,42-43; train.py:343-349).  Here:
a device-accurate timing harness (wall clock around block_until_ready,
with a host-fetch barrier fallback for relay transports whose
block_until_ready returns early) and a jax.profiler trace context for
TensorBoard-viewable device traces.
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Callable, Dict

import numpy as np

log = logging.getLogger("echr_tpu.profiling")


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard's profile tab).

    MEASURED (round 2b): through the axon relay PJRT plugin,
    jax.profiler.start_trace hard-aborts the process inside the plugin
    (xla::ValueOrThrowWrapper C++ stack, not a catchable Python error) —
    device-side tracing needs a directly-attached TPU.  The wall-clock
    harness below (time_fn with host-fetch barriers) is the profiling
    path that works everywhere; op-level attribution in this environment
    comes from ablation probes (docs/BENCH_NOTES.md)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _barrier(out) -> None:
    """Completion barrier: fetch one element to host.  jax.block_until_ready
    alone is unreliable through the axon relay (returns pre-completion)."""
    import jax

    leaves = jax.tree.leaves(out)
    if leaves:
        x = leaves[0]
        if hasattr(x, "ravel") and not isinstance(x, np.ndarray):
            # slice ON DEVICE first: np.asarray(whole leaf) would pull the
            # full buffer through the relay (MBs of variable transfer time
            # inside every measured sample); the tiny slice program still
            # depends on the whole computation, so it is a true barrier
            x = x.ravel()[:1]
        np.asarray(x)


def time_fn(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 2,
    **kw,
) -> Dict[str, float]:
    """Steady-state timing with host-fetch barriers.  Returns mean/p50/min
    seconds per call."""
    for _ in range(warmup):
        _barrier(fn(*args, **kw))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _barrier(fn(*args, **kw))
        samples.append(time.perf_counter() - t0)
    arr = np.array(samples)
    return {
        "mean_s": float(arr.mean()),
        "p50_s": float(np.percentile(arr, 50)),
        "min_s": float(arr.min()),
        "iters": iters,
    }


class StepTimer:
    """Rolling time/batch logger (reference: train.py:343-349 logs wall time
    per losses_log_every window)."""

    def __init__(self):
        self.t0 = time.time()
        self.n = 0

    def tick(self) -> None:
        self.n += 1

    def rate(self) -> float:
        dt = time.time() - self.t0
        return dt / max(self.n, 1)

    def reset(self) -> None:
        self.t0 = time.time()
        self.n = 0

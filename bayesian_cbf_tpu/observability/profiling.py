"""Tracing / profiling (SURVEY.md 5.1).

The reference's profiling is per-control-step wall prints
(controllers.py:586,659) and timeit around `custom_predict_fullmat`
(pendulum.py:1367-1372).  On TPU the per-step axis lives inside one
jitted scan, so the equivalents are:

  * `trace(logdir)` — context manager around `jax.profiler` producing an
    XPlane/perfetto trace of everything dispatched inside (kernel-level
    timeline; view with tensorboard-profile or perfetto);
  * `step_timer(fn)` — host-side wall timing of a jitted callable with
    proper `block_until_ready` fencing, the timeit.repeat(min) analogue;
  * `elapsed_channel(logger, tag, seconds, step)` — logs `<exp>/elapsed`
    scalars the way the reference benchmark harness does
    (unicycle_move_to_pose.py:2119-2124).

`python bench.py` honors BENCH_PROFILE=<dir> to wrap its timed reps in
`trace` so a flagship-bench timeline is one env var away.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_trace: bool = False):
    """Capture a device+host profiler trace of the enclosed block."""
    jax.profiler.start_trace(logdir,
                             create_perfetto_trace=create_perfetto_trace)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def step_timer(fn: Callable, *args, reps: int = 5,
               warmup: bool = True) -> float:
    """Best-of-`reps` wall seconds for one call of a jitted `fn`
    (timeit.repeat(min) parity with device fencing)."""
    if warmup:
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def elapsed_channel(logger, tag: str, seconds: float,
                    step: int = 0) -> None:
    """Log an `<exp>/elapsed`-style scalar (the reference's benchmark
    logging channel)."""
    logger.add_scalar(tag if tag.endswith("elapsed") else tag + "/elapsed",
                      seconds, step)


def annotate(name: str):
    """Named region for the profiler timeline (TraceAnnotation): host-side
    spans around dispatch sites show up alongside device kernels."""
    return jax.profiler.TraceAnnotation(name)

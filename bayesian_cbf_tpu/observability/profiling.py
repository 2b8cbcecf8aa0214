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


# ---------------------------------------------------------------------------
# Offline trace decomposition (round-4 methodology, made a tool)
# ---------------------------------------------------------------------------

#: name-substring -> bucket used by `decompose_trace`.  Order matters
#: (first match wins).  Defaults match this framework's kernels; pass a
#: custom mapping for other programs.
DEFAULT_BUCKETS = (
    ("kinv_logdet", "fit_kernel"),
    ("batched_ipm", "ipm_kernel"),
    ("chol", "chol_kernel"),
    ("fusion", "fusion"),
    ("copy", "copy"),
    ("dynamic", "dynamic_slice"),
)


def _load_trace_events(trace_path: str):
    import gzip
    import json
    opener = gzip.open if trace_path.endswith(".gz") else open
    with opener(trace_path, "rt") as f:
        return json.load(f).get("traceEvents", [])


def decompose_trace(trace_path: str, buckets=DEFAULT_BUCKETS,
                    top_level_prefix: str = "jit_") -> dict:
    """Decompose a `trace(...)`-produced trace.json(.gz) into per-bucket
    device seconds, the methodology behind records
    `bench_device_profile_decomposition_r4`.

    Finds the device (TPU/GPU) lane, takes the LAST top-level program
    span (name starting with `top_level_prefix` — the steady-state rep,
    past compile/warmup), sums leaf events inside it by bucket, and
    separately attributes events inside `while` loops that contain a
    fit-kernel call ("fit") vs the rest ("scan").  Returns::

        {"span_s": ..., "leaf_busy_s": ..., "dispatch_gap_s": ...,
         "by_bucket": {bucket: seconds},
         "fit": {bucket: seconds}, "scan": {bucket: seconds}}

    Rationale (measured, NOTES_round4.md): per-call HOST timing through
    the tunnel carries a ~50 ms dispatch constant and profiling inflates
    host wall ~23x, but device spans match the unprofiled wall — offline
    span analysis is the only trustworthy per-op attribution on this
    part.  Host-side profile tooling only; nothing here runs in-graph.
    """
    evs = _load_trace_events(trace_path)
    pids = {e["pid"]: e["args"].get("name", "")
            for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [k for k, v in pids.items()
           if "TPU" in v or "GPU" in v or "/device" in v.lower()]
    if not dev:
        raise ValueError("no device lane found in %s" % trace_path)
    X = [e for e in evs if e.get("ph") == "X" and e.get("pid") in dev]
    tops = sorted((e for e in X
                   if e["name"].startswith(top_level_prefix)),
                  key=lambda e: e["ts"])
    if not tops:
        raise ValueError("no top-level %r span in the device lane"
                         % top_level_prefix)
    # the program of interest is the LONGEST top-level span (ties: the
    # latest).  "Last" alone is wrong whenever a tiny fetch program
    # (e.g. the jit_sum of a host-fence) runs after the main one.
    dmax = max(e["dur"] for e in tops)
    span = [e for e in tops if e["dur"] == dmax][-1]
    t0, t1 = span["ts"], span["ts"] + span["dur"]
    inside = [e for e in X
              if e["ts"] >= t0 and e["ts"] + e.get("dur", 0) <= t1
              and e is not span]

    def bucket_of(name):
        for sub, b in buckets:
            if sub in name.lower():
                return b
        return "other"

    def is_wrapper(e):
        # control-flow wrappers and bare region markers nest leaf events
        return e["name"].startswith("while") or e["name"].isdigit()

    whiles = [e for e in inside if e["name"].startswith("while")]

    def contains_fit(w):
        a, b = w["ts"], w["ts"] + w["dur"]
        return any("kinv_logdet" in e["name"] for e in inside
                   if a <= e["ts"] < b and e.get("dur", 0) > 0)

    fit_rng = [(w["ts"], w["ts"] + w["dur"])
               for w in whiles if contains_fit(w)]

    by_bucket, fit, scan = {}, {}, {}
    leaf_busy = 0
    for e in inside:
        if is_wrapper(e):
            continue
        sec = e.get("dur", 0) / 1e6
        leaf_busy += sec
        b = bucket_of(e["name"])
        by_bucket[b] = by_bucket.get(b, 0.0) + sec
        tgt = fit if any(a <= e["ts"] and e["ts"] + e.get("dur", 0) <= c
                         for a, c in fit_rng) else scan
        tgt[b] = tgt.get(b, 0.0) + sec
    span_s = span["dur"] / 1e6
    rnd = lambda d: {k: round(v, 6) for k, v in
                     sorted(d.items(), key=lambda kv: -kv[1])}
    return {"span_s": round(span_s, 6),
            "leaf_busy_s": round(leaf_busy, 6),
            "dispatch_gap_s": round(span_s - leaf_busy, 6),
            "by_bucket": rnd(by_bucket),
            "fit": rnd(fit), "scan": rnd(scan)}

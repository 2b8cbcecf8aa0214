"""decompose_trace: offline device-span attribution for profiler traces.

Pins the parsing/bucketing logic on a synthetic trace shaped like the
real round-4 flagship trace (device process lane, top-level jit span,
nested fit/scan `while` wrappers, leaf fusions and kernels) so the tool
the round-4 profile methodology was promoted into
(records `bench_device_profile_decomposition_r4`) cannot silently rot.
Host-side analysis only — no TPU, no jit.
"""
import gzip
import json
import os

import pytest

from bayesian_cbf_tpu.observability.profiling import decompose_trace


def _write_trace(path, events):
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)


def _synthetic_events():
    # metadata: pid 1 = host (ignored), pid 3 = device lane
    evs = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "python host"}},
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
    ]
    # host-side event that must be ignored
    evs.append({"ph": "X", "pid": 1, "ts": 0, "dur": 10_000_000,
                "name": "jit__lambda(999)"})
    # two top-level device spans: warmup + steady-state (the LAST is used)
    evs.append({"ph": "X", "pid": 3, "ts": 0, "dur": 1000,
                "name": "jit__lambda(123)"})
    t0 = 10_000  # steady-state span: 1000 us total
    evs.append({"ph": "X", "pid": 3, "ts": t0, "dur": 1000,
                "name": "jit__lambda(123)"})
    # fit while (contains the fit kernel): 400 us
    evs.append({"ph": "X", "pid": 3, "ts": t0 + 0, "dur": 400,
                "name": "while.5"})
    evs.append({"ph": "X", "pid": 3, "ts": t0 + 0, "dur": 300,
                "name": "jvp_jit__batched_kinv_logdet_chol_jit__.68"})
    evs.append({"ph": "X", "pid": 3, "ts": t0 + 300, "dur": 100,
                "name": "multiply_reduce_fusion.367"})
    # scan while (no fit kernel): 500 us
    evs.append({"ph": "X", "pid": 3, "ts": t0 + 400, "dur": 500,
                "name": "while.6"})
    evs.append({"ph": "X", "pid": 3, "ts": t0 + 400, "dur": 250,
                "name": "fusion.4699"})
    evs.append({"ph": "X", "pid": 3, "ts": t0 + 650, "dur": 150,
                "name": "batched_ipm.35"})
    evs.append({"ph": "X", "pid": 3, "ts": t0 + 800, "dur": 50,
                "name": "copy-done.2"})
    # bare digit region marker (wrapper, must not be double counted)
    evs.append({"ph": "X", "pid": 3, "ts": t0, "dur": 1000, "name": "1"})
    # 50 us outside any while -> still a leaf, lands in "scan"
    evs.append({"ph": "X", "pid": 3, "ts": t0 + 900, "dur": 40,
                "name": "dynamic_update_slice.9"})
    return evs


def test_decompose_trace_buckets(tmp_path):
    p = os.path.join(tmp_path, "trace.json.gz")
    _write_trace(p, _synthetic_events())
    r = decompose_trace(p)
    assert r["span_s"] == pytest.approx(1000e-6)
    # leaves: 300+100+250+150+50+40 = 890 us (whiles + digit markers
    # excluded, host lane excluded, warmup span excluded)
    assert r["leaf_busy_s"] == pytest.approx(890e-6)
    assert r["dispatch_gap_s"] == pytest.approx(110e-6)
    assert r["by_bucket"]["fit_kernel"] == pytest.approx(300e-6)
    assert r["by_bucket"]["fusion"] == pytest.approx(350e-6)
    assert r["by_bucket"]["ipm_kernel"] == pytest.approx(150e-6)
    assert r["by_bucket"]["copy"] == pytest.approx(50e-6)
    # fit/scan attribution: the fusion inside while.5 is fit-side
    assert r["fit"]["fit_kernel"] == pytest.approx(300e-6)
    assert r["fit"]["fusion"] == pytest.approx(100e-6)
    assert r["scan"]["fusion"] == pytest.approx(250e-6)
    assert r["scan"]["ipm_kernel"] == pytest.approx(150e-6)
    assert r["scan"]["dynamic_slice"] == pytest.approx(40e-6)


def test_decompose_trace_plain_json(tmp_path):
    # .json (not gzipped) also accepted
    p = os.path.join(tmp_path, "trace.json")
    with open(p, "w") as f:
        json.dump({"traceEvents": _synthetic_events()}, f)
    r = decompose_trace(p)
    assert r["by_bucket"]["fit_kernel"] == pytest.approx(300e-6)


def test_decompose_trace_errors(tmp_path):
    p = os.path.join(tmp_path, "empty.json")
    with open(p, "w") as f:
        json.dump({"traceEvents": []}, f)
    with pytest.raises(ValueError):
        decompose_trace(p)

"""Native binary event-log writer (observability/fastlog.py + the C++
library native/fastlog.cpp): format round-trip, native/python parity,
MetricsLogger binary backend, and replay compatibility."""
import json
import os
import os.path as osp

import numpy as np
import pytest

from bayesian_cbf_tpu.observability.fastlog import (
    FastLogWriter, read_fastlog)
from bayesian_cbf_tpu.observability.logger import (
    MetricsLogger, load_metrics)


def _write_sample(path, force_python):
    w = FastLogWriter(path, force_python=force_python)
    w.write("scalar/x", 0, 3.5)
    w.write_rows("vis/state", np.arange(24, dtype=np.float32).reshape(8, 3),
                 step0=0, stride=2)
    w.write("vec/y", 7, np.array([1.0, 2.0, 3.0]))
    w.flush()
    w.close()
    return w


def test_python_writer_roundtrip(tmp_path):
    p = str(tmp_path / "p.flog")
    w = _write_sample(p, force_python=True)
    assert not w.native
    g = read_fastlog(p)
    assert set(g) == {"scalar/x", "vis/state", "vec/y"}
    steps, vals = g["vis/state"]
    np.testing.assert_array_equal(steps, np.arange(8) * 2)
    np.testing.assert_allclose(
        vals, np.arange(24, dtype=np.float32).reshape(8, 3))
    assert g["scalar/x"][1][0, 0] == 3.5


def test_native_writer_matches_python_bytes(tmp_path):
    """The C++ writer and the pure-Python fallback emit the identical
    byte stream (same framing), so readers never care which wrote it."""
    pn, pp = str(tmp_path / "n.flog"), str(tmp_path / "p.flog")
    wn = _write_sample(pn, force_python=False)
    _write_sample(pp, force_python=True)
    if not wn.native:
        pytest.skip("no g++ / prebuilt libfastlog.so on this host")
    with open(pn, "rb") as a, open(pp, "rb") as b:
        assert a.read() == b.read()


def test_ragged_tag(tmp_path):
    p = str(tmp_path / "r.flog")
    with FastLogWriter(p, force_python=True) as w:
        w.write("r", 0, np.zeros(2))
        w.write("r", 1, np.zeros(5))
    steps, vals = read_fastlog(p)["r"]
    assert list(steps) == [0, 1]
    assert isinstance(vals, list) and vals[0].size == 2 and vals[1].size == 5


def test_corrupt_file_raises(tmp_path):
    p = str(tmp_path / "bad.flog")
    with open(p, "wb") as f:
        f.write(b"NOTMAGIC")
    with pytest.raises(ValueError):
        read_fastlog(p)


def test_metrics_logger_binary_backend(tmp_path):
    lg = MetricsLogger(runs_dir=str(tmp_path), exp_tags=("t",),
                       stamp="0", backend="binary",
                       config={"name": "binary-test"})
    lg.add_scalar("a", 1.25, 3)
    lg.add_rows("b", np.arange(10.0).reshape(5, 2), every=1)
    lg.flush()
    lg.close()
    assert osp.exists(osp.join(lg.dir, "metrics.flog"))
    g = load_metrics(lg.dir)
    assert g["a"] == [(3, 1.25)]
    assert g["b"][2] == (2, [4.0, 5.0])
    with open(osp.join(lg.dir, "config.json")) as f:
        assert json.load(f)["name"] == "binary-test"


def test_jsonl_backend_unchanged(tmp_path):
    lg = MetricsLogger(runs_dir=str(tmp_path), exp_tags=("t",), stamp="1")
    lg.add_scalar("a", 2.0, 0)
    lg.add_rows("b", np.arange(4.0).reshape(2, 2), every=1)
    lg.flush()
    lg.close()
    g = load_metrics(lg.dir)
    assert g["a"] == [(0, 2.0)] and g["b"][1] == (1, [2.0, 3.0])


def test_replay_from_binary_log(tmp_path):
    """replay_run must reconstruct a run logged through the binary
    backend (the reader path is shared by load_metrics)."""
    from bayesian_cbf_tpu.observability.logger import replay_run
    lg = MetricsLogger(runs_dir=str(tmp_path), exp_tags=("t",),
                       stamp="2", backend="binary")
    X = np.stack([np.linspace(0, 1, 12), np.linspace(0, 2, 12),
                  np.zeros(12)], axis=1)
    lg.add_rows("vis/state", X)
    lg.dump_config({"obstacles": [{"center": [0.5, 0.5], "radius": 0.1}],
                    "goal": [1.0, 2.0, 0.0]})
    lg.close()
    out = replay_run(lg.dir, savefile=str(tmp_path / "replay.png"))
    assert out is not None


def test_version_stamp_in_config(tmp_path):
    """Every config.json carries a version stamp (the reference
    version-stamps artifacts via git describe, bayes_cbf/__init__.py:1-7)."""
    from bayesian_cbf_tpu.observability.logger import version_stamp
    lg = MetricsLogger(runs_dir=str(tmp_path), exp_tags=("v",), stamp="0",
                       config={"name": "n"})
    lg.close()
    with open(osp.join(lg.dir, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["_version"].startswith("0.2.0")
    assert version_stamp().startswith("0.2.0")


def test_filter_runs(tmp_path):
    """filter_log_files parity: newest-first, config-predicate filtered."""
    import time as _time
    from bayesian_cbf_tpu.observability.logger import filter_runs
    a = MetricsLogger(runs_dir=str(tmp_path), exp_tags=("a",), stamp="0",
                      config={"kind": "x"})
    a.add_scalar("t", 1.0, 0); a.close()
    _time.sleep(0.05)
    b = MetricsLogger(runs_dir=str(tmp_path), exp_tags=("b",), stamp="1",
                      backend="binary", config={"kind": "y"})
    b.add_scalar("t", 2.0, 0); b.close()
    runs = filter_runs(str(tmp_path))
    assert runs == [b.dir, a.dir]          # newest first, both backends
    only_x = filter_runs(str(tmp_path), lambda c: c.get("kind") == "x")
    assert only_x == [a.dir]
    assert filter_runs(str(tmp_path / "missing")) == []


def test_step_timer_and_annotate():
    import jax
    import jax.numpy as jnp
    from bayesian_cbf_tpu.observability.profiling import (
        step_timer, annotate)
    f = jax.jit(lambda x: (x * x).sum())
    with annotate("bench-region"):
        dt = step_timer(f, jnp.arange(8.0), reps=2)
    assert dt >= 0.0

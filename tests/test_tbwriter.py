"""tfevents WRITE interop (observability/tbwriter.py): what we write,
the reference's own tooling can read.

Round-trips scalars and TensorProto tensor summaries through
tensorboard's event_file_loader — the same loader family the
reference's load_tensorboard_scalars / stream_tensorboard_scalars use
(bayes_cbf/misc.py:343-359) and that scripts/trigger_parity_study.py
uses to read the reference's committed runs."""
import numpy as np
import pytest

tb = pytest.importorskip("tensorboard")


def test_tfevents_roundtrip(tmp_path):
    from bayesian_cbf_tpu.observability.tbwriter import (
        TensorboardWriter, load_tensorboard_scalars)

    d = str(tmp_path / "run")
    w = TensorboardWriter(d)
    w.add_scalar("opt/rho", 2.33, 0)
    w.add_scalar("opt/rho", 2.31, 1)
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    w.add_tensor("vis/state", arr, 5)
    w.close()

    got = load_tensorboard_scalars(d)
    assert [s for s, _ in got["opt/rho"]] == [0, 1]
    np.testing.assert_allclose([v for _, v in got["opt/rho"]],
                               [2.33, 2.31], rtol=1e-6)
    step, tensor = got["vis/state"][0]
    assert step == 5
    np.testing.assert_array_equal(tensor, arr)


def test_tensor_summary_readable_via_float_val_only(tmp_path):
    """The reference's own loaders read ONLY tensor.float_val
    (bayes_cbf/misc.py:348-350): emulate that reader exactly and assert
    our tensor summaries survive it — tensor_content-encoded files do
    not (they reshape an empty float_val and raise)."""
    from bayesian_cbf_tpu.observability.tbwriter import TensorboardWriter
    from tensorboard.backend.event_processing import event_file_loader
    import os

    d = str(tmp_path / "run")
    w = TensorboardWriter(d)
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    w.add_tensor("vis/state", arr, 7)
    w.close()

    path = [os.path.join(d, f) for f in os.listdir(d)
            if "tfevents" in f][0]
    got = None
    for ev in event_file_loader.LegacyEventFileLoader(path).Load():
        if ev.summary is not None and len(ev.summary.value):
            val = ev.summary.value[0]
            # the reference reader: float_val only, no tensor_content
            got = np.array(val.tensor.float_val).reshape(
                [dd.size for dd in val.tensor.tensor_shape.dim])
            step = ev.step
    assert got is not None and step == 7
    np.testing.assert_array_equal(got.astype(np.float32), arr)


def test_replay_from_tensorboard_backend(tmp_path):
    """replay_run round-trip on a tfevents-only run dir: load_metrics
    auto-detects the tensorboard backend (the reference replays straight
    from event files, unicycle_move_to_pose.py:1421-1452), and
    filter_runs finds such dirs."""
    from bayesian_cbf_tpu.observability.logger import (
        MetricsLogger, replay_run, filter_runs, load_metrics)
    lg = MetricsLogger(runs_dir=str(tmp_path), exp_tags=("tbrun",),
                       stamp="1", backend="tensorboard")
    X = np.stack([np.linspace(0, 1, 12), np.linspace(0, 2, 12),
                  np.zeros(12)], axis=1).astype(np.float32)
    for t, row in enumerate(X):
        lg.add_tensor("vis/state", row, t)
    lg.dump_config({"obstacles": [{"center": [0.5, 0.5], "radius": 0.1}],
                    "goal": [1.0, 2.0, 0.0], "name": "tbrun"})
    lg.close()

    g = load_metrics(lg.dir)
    assert len(g["vis/state"]) == 12
    out = replay_run(lg.dir, savefile=str(tmp_path / "replay.png"))
    assert out is not None
    hits = filter_runs(str(tmp_path), lambda c: c.get("name") == "tbrun")
    assert hits and hits[0] == lg.dir


def test_metrics_logger_tensorboard_backend(tmp_path):
    from bayesian_cbf_tpu.observability.logger import MetricsLogger
    from bayesian_cbf_tpu.observability.tbwriter import (
        load_tensorboard_scalars)

    lg = MetricsLogger(runs_dir=str(tmp_path), exp_tags=("tb",),
                       backend="tensorboard",
                       config={"max_risk": 0.01})
    lg.add_scalar("opt/value", 1.5, 0)
    lg.add_tensor("vis/uopt", np.array([0.1, -0.2], np.float32), 0)
    lg.close()

    got = load_tensorboard_scalars(lg.dir)
    assert got["opt/value"][0][1] == pytest.approx(1.5)
    np.testing.assert_allclose(got["vis/uopt"][0][1], [0.1, -0.2])
    import os, json
    cfg = json.load(open(os.path.join(lg.dir, "config.json")))
    assert cfg["max_risk"] == 0.01 and "_version" in cfg

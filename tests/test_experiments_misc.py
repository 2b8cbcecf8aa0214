"""move_to_pose demos, car experiments, replay, learn_dynamics comparison."""
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_cbf_tpu.experiments.move_to_pose import (
    move_to_pose_clf_cartesian, move_to_pose_clf_polar, move_to_pose_pid,
    track_trajectory_clf_cartesian)
from bayesian_cbf_tpu.experiments.car import (
    car_learn_dynamics, run_car_control_ground_truth, min_car_clearance,
    sample_car_data)

X0 = (-2.0, -0.5, -math.pi / 4)
XG = (0.0, 0.0, math.pi / 4)


def test_move_to_pose_clf_cartesian_converges():
    X, U, pres = move_to_pose_clf_cartesian(X0, XG, numSteps=300, dt=0.02)
    assert bool(jnp.all(jnp.isfinite(X)))
    d0 = np.linalg.norm(np.asarray(X[0][:2]) - np.asarray(XG[:2]))
    d1 = np.linalg.norm(np.asarray(X[-1][:2]) - np.asarray(XG[:2]))
    assert d1 < 0.5 * d0


def test_track_trajectory_clf_cartesian():
    X, U, pres = track_trajectory_clf_cartesian(X0, XG, numSteps=200,
                                                dt=0.02)
    assert bool(jnp.all(jnp.isfinite(X)))
    d1 = np.linalg.norm(np.asarray(X[-1][:2]) - np.asarray(XG[:2]))
    assert d1 < 1.5


def test_move_to_pose_pid():
    X, U = move_to_pose_pid(X0, XG, numSteps=500, dt=0.01)
    d1 = np.linalg.norm(np.asarray(X[-1][:2]) - np.asarray(XG[:2]))
    assert d1 < 0.3


def test_move_to_pose_polar_runs():
    X, U, pres = move_to_pose_clf_polar(X0, XG, numSteps=100, dt=0.01)
    assert bool(jnp.all(jnp.isfinite(X)))


def test_car_sample_and_learn():
    X, U, Xdot = sample_car_data(jax.random.PRNGKey(0), numSteps=60)
    assert X.shape == (60, 6)
    gp, params, data, cache, rmse = car_learn_dynamics(max_train=24,
                                                       training_iter=8)
    assert np.isfinite(rmse)
    assert rmse < 5.0


def test_car_ground_truth_control_safe():
    cbcs, X, U, pres = run_car_control_ground_truth(numSteps=150, dt=0.02)
    assert bool(jnp.all(jnp.isfinite(X)))
    clear = min_car_clearance(cbcs, X)
    assert float(clear.min()) > -0.05


def test_replay_roundtrip(tmp_path):
    from bayesian_cbf_tpu.observability.logger import (MetricsLogger,
                                                       replay_run)
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START)
    from bayesian_cbf_tpu.sim.rollout import simulate_unicycle
    sim = make_ackermann_tracking_sim(numSteps=10, dt=0.01, max_train=8,
                                      training_iter=2,
                                      train_every_n_steps=5, socp_iters=10)
    out = simulate_unicycle(sim, STATE_START)
    log = MetricsLogger(runs_dir=str(tmp_path), exp_tags=["replay"],
                        config={"name": "replay-test"})
    log.log_rollout(out)
    log.close()
    ax = replay_run(log.dir, savefile=str(tmp_path / "replay.png"))
    assert os.path.exists(str(tmp_path / "replay.png"))


def test_harness_sweep_and_overrides():
    """kwplus-parity helpers: grid expansion and dotted-key overrides."""
    from bayesian_cbf_tpu.experiments.harness import (apply_overrides,
                                                      kwvariations)
    var = kwvariations(a=[1, 2], b=["x", "y"])
    assert len(var) == 4 and {"a": 2, "b": "y"} in var
    cfg = apply_overrides({"ctrl": {"max_risk": 0.5}, "dt": 0.01},
                          {"ctrl.max_risk": 0.01, "ctrl.new": 3})
    assert cfg["ctrl"]["max_risk"] == 0.01
    assert cfg["ctrl"]["new"] == 3
    assert cfg["dt"] == 0.01


def test_harness_run_experiment(tmp_path):
    """run_experiment creates a run dir with config.json + logged rollout
    (unicycle_demo parity) and the CLI registry resolves all README
    experiments."""
    import json
    import os.path as osp
    from bayesian_cbf_tpu.experiments.harness import (experiment_names,
                                                      run_experiment)
    assert len(experiment_names()) == 4
    sim, out, run_dir = run_experiment(
        "unicycle_bayes_cbf_safe_obstacle", runs_dir=str(tmp_path),
        numSteps=30, dt=0.01, max_train=12, training_iter=4,
        train_every_n_steps=20)
    assert osp.exists(osp.join(run_dir, "config.json"))
    assert osp.exists(osp.join(run_dir, "metrics.jsonl"))
    cfg = json.load(open(osp.join(run_dir, "config.json")))
    assert cfg["numSteps"] == 30
    assert "obstacles" in cfg and len(cfg["obstacles"]) == 2


def test_covariance_ellipse_analysis(tmp_path):
    """Covariance-ellipse analysis figures
    (visualize/unicycle_covariances.py parity): MVGP blocks are Bk kron A
    (rank-deficient projections allowed), CoGP blocks are full; both
    render to 3x3 projection grids."""
    import os.path as osp
    from bayesian_cbf_tpu.observability.covariances import (
        unicycle_covariances_exp, unicycle_covariances_vis)
    results, Xtest = unicycle_covariances_exp(
        max_train=24, numSteps=96, dt=0.01, training_iter=8, n_test=2)
    assert set(results) == {"matrix", "vector"}
    for name, blocks in results.items():
        assert blocks.shape == (2, 9, 9)
        assert np.all(np.isfinite(blocks))
        w = np.linalg.eigvalsh(0.5 * (blocks[0] + blocks[0].T))
        assert w.min() > -1e-6
    paths = unicycle_covariances_vis(results, savedir=str(tmp_path))
    for p in paths:
        assert osp.getsize(p) > 1000


def test_learned_dynamics_contours_figure(tmp_path):
    """The reference's learn-dynamics contour grid (pendulum.py:1108-1240):
    rows ground-truth/matrix/vector, columns f1/f2/g11/g21, shared
    column levels, training points overlaid."""
    from bayesian_cbf_tpu.observability.plotting import (
        plot_learned_dynamics_contours)
    out = str(tmp_path / "contours.png")
    fig = plot_learned_dynamics_contours(max_train=32, training_iter=5,
                                         grid=8, savefile=out)
    import os
    assert os.path.exists(out)
    assert len(fig.axes) >= 12       # 3 rows x 4 cols (+ colorbars)


def test_no_obstacle_config_runs():
    """The empty-obstacle configuration must still run end-to-end: the
    controller's no-CBC path (CLF cone + objective only — cbf_gammas
    lives in the controller closure, so `sim._replace(cbfs=())` is the
    supported construction) produces finite, mostly-feasible rollouts.
    Pins the variant scripts/rollout_phase_split.py measures and the
    reference's obstacle-free tracking mode
    (bayes_cbf/unicycle_move_to_pose.py:1689-1734 with no obstacles)."""
    from bayesian_cbf_tpu.experiments.unicycle import (
        make_ackermann_tracking_sim, STATE_START)
    from bayesian_cbf_tpu.sim.rollout import simulate_unicycle
    sim = make_ackermann_tracking_sim(numSteps=30, dt=0.01, max_train=8,
                                      training_iter=2,
                                      train_every_n_steps=10,
                                      socp_iters=10)
    sim = sim._replace(cbfs=())
    out = simulate_unicycle(sim, STATE_START)
    assert bool(jnp.all(jnp.isfinite(out.X)))
    assert bool(jnp.all(jnp.isfinite(out.U)))
    assert float(jnp.mean(out.info.feasible)) > 0.9

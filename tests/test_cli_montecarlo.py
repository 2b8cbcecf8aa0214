"""CLI entry point (cli.py) and the sharded Monte-Carlo experiment
(experiments/montecarlo.py) — end-to-end on tiny configs."""
import json
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_cli_runs_experiment(tmp_path, capsys):
    from bayesian_cbf_tpu.cli import main
    rc = main(["unicycle_bayes_cbf_safe_obstacle",
               "--set", "numSteps=40", "--set", "dt=0.01",
               "--set", "max_train=12", "--set", "training_iter=3",
               "--runs-dir", str(tmp_path), "--log-backend", "binary"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= out["feasible_frac"] <= 1.0
    assert osp.exists(osp.join(out["run_dir"], "metrics.flog"))
    assert osp.exists(osp.join(out["run_dir"], "config.json"))


def test_cli_sweep(tmp_path, capsys):
    from bayesian_cbf_tpu.cli import main
    rc = main(["unicycle_bayes_cbf_safe_obstacle",
               "--sweep", "max_risk=[0.01,0.4999]",
               "--set", "numSteps=30", "--set", "dt=0.01",
               "--set", "max_train=12", "--set", "training_iter=3",
               "--runs-dir", str(tmp_path)])
    assert rc == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2
    assert {l["overrides"]["max_risk"] for l in lines} == {0.01, 0.4999}
    for l in lines:
        assert osp.isdir(l["run_dir"])


def test_cli_rejects_unknown_experiment():
    from bayesian_cbf_tpu.cli import main
    with pytest.raises(SystemExit):
        main(["not_an_experiment"])


def test_monte_carlo_sharded_stats():
    """Sharded Monte-Carlo over the virtual 8-device mesh: stats are
    scalar on-device reductions and rollouts are finite."""
    from bayesian_cbf_tpu.experiments.montecarlo import monte_carlo_unicycle
    sim, outs, stats = monte_carlo_unicycle(
        n_rollouts=8, numSteps=40, dt=0.01, max_train=12, training_iter=3)
    assert outs.X.shape[0] == 8
    assert bool(jnp.all(jnp.isfinite(outs.X)))
    assert set(stats) >= {"collision_fraction", "mean_goal_distance",
                          "min_clearance", "feasible_fraction"}
    assert 0.0 <= float(stats["collision_fraction"]) <= 1.0


def test_trigger_sweep_shapes():
    from bayesian_cbf_tpu.experiments.montecarlo import (
        monte_carlo_unicycle, trigger_sweep_for_rollout)
    sim, outs, _ = monte_carlo_unicycle(
        n_rollouts=8, numSteps=40, dt=0.01, max_train=12, training_iter=3)
    tau, tau_num, Lfh, Lfh_num, xvel = trigger_sweep_for_rollout(
        sim, outs, rollout_idx=0, stride=10)
    n = np.asarray(tau).shape[0]
    assert n == 4
    assert np.asarray(Lfh).shape[0] == n
    assert np.all(np.asarray(Lfh) > 0)

#!/usr/bin/env python
"""Generate the committed visual artifacts under records/figures/:
trajectory figures for the four README experiments, the learning-run
replay animation, the MVGP/CoGP covariance-projection grids, and the
speed-test figure.  Run on the chip (fast) or CPU (--cpu)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "records", "figures")
os.makedirs(OUT, exist_ok=True)


def readme_trajectories():
    from bayesian_cbf_tpu.experiments.unicycle import (
        unicycle_mean_cbf_collides_obstacle,
        unicycle_bayes_cbf_safe_obstacle,
        unicycle_learning_helps_avoid_getting_stuck,
        unicycle_no_learning_gets_stuck, STATE_GOAL)
    from bayesian_cbf_tpu.observability.plotting import plot_unicycle_run
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 4, figsize=(16, 4))
    runs = [
        ("mean-CBF risk=0.5: collides", unicycle_mean_cbf_collides_obstacle),
        ("Bayes-CBF risk=0.01: safe", unicycle_bayes_cbf_safe_obstacle),
        ("learning on: passes", unicycle_learning_helps_avoid_getting_stuck),
        ("no learning: stuck", unicycle_no_learning_gets_stuck),
    ]
    learn_out = None
    learn_sim = None
    for ax, (title, fn) in zip(axes, runs):
        sim, out = fn(warm_start=True)
        plot_unicycle_run(out, cbfs=sim.cbfs, x_goal=STATE_GOAL, ax=ax,
                          title=title)
        if "passes" in title:
            learn_out, learn_sim = out, sim
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, "readme_experiments.png"), dpi=110)
    plt.close(fig)
    print("readme_experiments.png", flush=True)
    return learn_sim, learn_out


def animation(sim, out):
    import tempfile
    from bayesian_cbf_tpu.observability.logger import MetricsLogger, replay_run
    log = MetricsLogger(runs_dir=tempfile.mkdtemp(), exp_tags=["learn"],
                        config={"name": "learning_helps"})
    log.log_rollout(out, every=5, sim=sim)
    log.close()
    path = replay_run(log.dir, animate=True,
                      savefile=os.path.join(OUT, "learning_helps.gif"),
                      frame_stride=2)
    print(os.path.basename(path), flush=True)


def covariances():
    from bayesian_cbf_tpu.observability.covariances import (
        unicycle_covariances_exp, unicycle_covariances_vis)
    results, _ = unicycle_covariances_exp(max_train=100, numSteps=256,
                                          training_iter=30)
    for p in unicycle_covariances_vis(results, savedir=OUT):
        print(os.path.basename(p), flush=True)


def speed_figure():
    from bayesian_cbf_tpu.experiments.pendulum import speed_test_matrix_vector
    from bayesian_cbf_tpu.observability.plotting import plot_speed_test
    res = speed_test_matrix_vector(max_train_list=(256, 320, 384, 512),
                                   ntimes=5, repeat=3, training_iter=50)
    plot_speed_test(res, savefile=os.path.join(OUT, "speed_test.png"))
    print("speed_test.png", flush=True)


def learned_dynamics_contours():
    from bayesian_cbf_tpu.observability.plotting import (
        plot_learned_dynamics_contours)
    plot_learned_dynamics_contours(
        max_train=120, training_iter=50, grid=25,
        savefile=os.path.join(OUT, "learned_dynamics_contours.png"))
    print("learned_dynamics_contours.png", flush=True)


if __name__ == "__main__":
    sim, out = readme_trajectories()
    animation(sim, out)
    covariances()
    speed_figure()
    learned_dynamics_contours()
    print("ALL_ARTIFACTS_DONE", flush=True)

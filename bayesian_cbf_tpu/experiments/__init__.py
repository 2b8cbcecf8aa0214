from .unicycle import (make_ackermann_tracking_sim,
                       unicycle_mean_cbf_collides_obstacle,
                       unicycle_bayes_cbf_safe_obstacle,
                       unicycle_learning_helps_avoid_getting_stuck,
                       unicycle_no_learning_gets_stuck,
                       unicycle_speed_test)
from .move_to_pose import (move_to_pose_clf_cartesian,
                           move_to_pose_clf_polar, move_to_pose_pid,
                           track_trajectory_clf_cartesian)
from .pendulum import (make_pendulum_online_sim,
                       run_pendulum_online_learning,
                       run_pendulum_online_batch,
                       run_pendulum_ground_truth,
                       speed_test_matrix_vector,
                       learn_dynamics_matrix_vector)
from .car import (car_learn_dynamics, run_car_control_ground_truth)
from .montecarlo import (monte_carlo_unicycle, trigger_sweep_for_rollout,
                         trigger_analysis_learning_run)
from .harness import (run_experiment, run_experiment_mult,
                      kwvariations, apply_overrides, experiment_names)

__all__ = [
    "make_ackermann_tracking_sim",
    "unicycle_mean_cbf_collides_obstacle",
    "unicycle_bayes_cbf_safe_obstacle",
    "unicycle_learning_helps_avoid_getting_stuck",
    "unicycle_no_learning_gets_stuck",
    "unicycle_speed_test",
    "move_to_pose_clf_cartesian", "move_to_pose_clf_polar",
    "move_to_pose_pid", "track_trajectory_clf_cartesian",
    "make_pendulum_online_sim", "run_pendulum_online_learning",
    "run_pendulum_online_batch",
    "run_pendulum_ground_truth", "speed_test_matrix_vector",
    "learn_dynamics_matrix_vector",
    "car_learn_dynamics", "run_car_control_ground_truth",
    "monte_carlo_unicycle", "trigger_sweep_for_rollout",
    "trigger_analysis_learning_run",
    "run_experiment", "run_experiment_mult", "kwvariations",
    "apply_overrides", "experiment_names",
]

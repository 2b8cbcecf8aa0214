from .unicycle import (make_ackermann_tracking_sim,
                       unicycle_mean_cbf_collides_obstacle,
                       unicycle_bayes_cbf_safe_obstacle,
                       unicycle_learning_helps_avoid_getting_stuck,
                       unicycle_no_learning_gets_stuck)

__all__ = [
    "make_ackermann_tracking_sim",
    "unicycle_mean_cbf_collides_obstacle",
    "unicycle_bayes_cbf_safe_obstacle",
    "unicycle_learning_helps_avoid_getting_stuck",
    "unicycle_no_learning_gets_stuck",
]

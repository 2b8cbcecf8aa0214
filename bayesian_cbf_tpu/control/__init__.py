from .clf_cbf import (cartesian2polar, polar2cartesian, CLFCartesian,
                      CLFPolar, ObstacleCBF,
                      obstacles_at_mid_from_start_and_goal,
                      single_obstacle_at_mid_from_start_and_goal)
from .planner import PiecewiseLinearPlanner, SplinePlanner, NoPlanner
from .bayes_controller import (BayesCLFControllerConfig, bayes_clf_control,
                               mean_clf_control)

__all__ = [
    "cartesian2polar", "polar2cartesian", "CLFCartesian", "CLFPolar",
    "ObstacleCBF", "obstacles_at_mid_from_start_and_goal",
    "single_obstacle_at_mid_from_start_and_goal",
    "PiecewiseLinearPlanner", "SplinePlanner", "NoPlanner",
    "BayesCLFControllerConfig", "bayes_clf_control", "mean_clf_control",
]

from .mesh import (make_mesh, batched_rollouts, rollout_safety_stats,
                   sharded_predict_fullmat,
                   trainaxis_sharded_predict_fullmat)

__all__ = ["make_mesh", "batched_rollouts", "rollout_safety_stats",
           "sharded_predict_fullmat",
           "trainaxis_sharded_predict_fullmat"]

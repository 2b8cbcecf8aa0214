from .mesh import make_mesh, batched_rollouts, rollout_safety_stats

__all__ = ["make_mesh", "batched_rollouts", "rollout_safety_stats"]

from .rollout import (UnicycleSim, simulate_unicycle, RolloutOutputs)

__all__ = ["UnicycleSim", "simulate_unicycle", "RolloutOutputs"]

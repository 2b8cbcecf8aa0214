from .trigger import trigger_intervals, lipschitz_bound_f
from .logger import MetricsLogger, save_checkpoint, load_checkpoint

__all__ = ["trigger_intervals", "lipschitz_bound_f",
           "MetricsLogger", "save_checkpoint", "load_checkpoint"]

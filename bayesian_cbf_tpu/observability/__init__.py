from .trigger import trigger_intervals, lipschitz_bound_f
from .logger import (MetricsLogger, save_checkpoint, load_checkpoint,
                     filter_runs, version_stamp, load_metrics, replay_run)
from .fastlog import FastLogWriter, read_fastlog
from .profiling import trace, step_timer, annotate

__all__ = ["trigger_intervals", "lipschitz_bound_f",
           "MetricsLogger", "save_checkpoint", "load_checkpoint",
           "filter_runs", "version_stamp", "load_metrics", "replay_run",
           "FastLogWriter", "read_fastlog",
           "trace", "step_timer", "annotate"]

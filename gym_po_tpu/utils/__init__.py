from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .debug import assert_finite, checked
from .profiling import Timer, annotate, steps_per_second, trace

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
    "steps_per_second",
    "trace",
    "annotate",
    "Timer",
    "checked",
    "assert_finite",
]

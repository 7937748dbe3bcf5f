"""Experiment glue: sacred-style config + run directories + task queue."""
from .taskqueue import BarrierNotReady, Task, TaskQueue, run_script_task

__all__ = ("BarrierNotReady", "Task", "TaskQueue", "run_script_task")

from .engine import Engine, TrainState
from .optim import make_optimizer, make_schedule
from .tasks import Task, UNetBaselineTask

__all__ = ["Engine", "TrainState", "make_optimizer", "make_schedule", "Task", "UNetBaselineTask"]

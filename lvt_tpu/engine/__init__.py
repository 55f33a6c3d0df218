from .hooks import (
    CallbackHook,
    EvalHook,
    IterationTimer,
    JaxProfiler,
    LRSchedulerHook,
    PeriodicCheckpointer,
    PeriodicWriter,
)
from .train_loop import HookBase, TrainerBase
from .trainer import TrainState, Trainer, make_train_step

__all__ = [
    "CallbackHook",
    "EvalHook",
    "HookBase",
    "IterationTimer",
    "JaxProfiler",
    "LRSchedulerHook",
    "PeriodicCheckpointer",
    "PeriodicWriter",
    "TrainState",
    "Trainer",
    "TrainerBase",
    "make_train_step",
]

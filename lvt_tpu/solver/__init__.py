from .build import build_lr_schedule, build_optimizer

__all__ = ["build_lr_schedule", "build_optimizer"]

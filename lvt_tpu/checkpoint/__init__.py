from .orbax_io import (
    latest_checkpoint,
    load_checkpoint,
    prune_checkpoints,
    resume_or_load,
    save_checkpoint,
)

__all__ = [
    "latest_checkpoint",
    "load_checkpoint",
    "prune_checkpoints",
    "resume_or_load",
    "save_checkpoint",
]

from . import comm
from .env import seed_all_rng, setup_environment
from .events import EventStorage, get_event_storage
from .logger import setup_logger
from .registry import Registry

__all__ = [
    "comm",
    "seed_all_rng",
    "setup_environment",
    "EventStorage",
    "get_event_storage",
    "setup_logger",
    "Registry",
]

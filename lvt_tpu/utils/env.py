"""Seeding and environment helpers (reference: vidgen/utils/env.py:15-105).

JAX threads PRNG keys explicitly, so global seeding only covers numpy/python
RNGs used by the host-side data pipeline; model RNG comes from
``jax.random.key(seed)`` handed out by the trainer.
"""

import datetime
import importlib
import logging
import os
import random

import numpy as np

__all__ = ["seed_all_rng", "setup_environment"]


def seed_all_rng(seed=None) -> int:
    """Set python/numpy seeds; returns the seed used.

    Mirrors reference env.py:15-35 (torch/np/random) minus torch — device RNG
    in JAX is key-threaded, not global.
    """
    if seed is None or seed < 0:
        seed = (
            os.getpid()
            + int(datetime.datetime.now().strftime("%S%f"))
            + int.from_bytes(os.urandom(2), "big")
        )
    np.random.seed(seed % (2 ** 32))
    random.seed(seed)
    return seed


_ENV_SETUP_DONE = False


def setup_environment():
    """Perform environment setup; runs a custom module named in
    $LVT_TPU_ENV_MODULE if set (reference env.py:69-105)."""
    global _ENV_SETUP_DONE
    if _ENV_SETUP_DONE:
        return
    _ENV_SETUP_DONE = True

    custom_module = os.environ.get("LVT_TPU_ENV_MODULE", "")
    if custom_module:
        module = importlib.import_module(custom_module)
        assert hasattr(module, "setup_environment") and callable(module.setup_environment), (
            f"Custom environment module {custom_module} must define a "
            "'setup_environment' function"
        )
        module.setup_environment()
        logging.getLogger(__name__).info(f"Ran custom env setup from {custom_module}")

"""Environment report (reference: vidgen/utils/collect_env.py:56-142)."""

import importlib
import os
import platform
import sys

__all__ = ["collect_env_info"]


def collect_env_info() -> str:
    data = []
    data.append(("sys.platform", sys.platform))
    data.append(("Python", sys.version.replace("\n", "")))
    data.append(("numpy", _version("numpy")))

    try:
        import jax

        data.append(("jax", jax.__version__))
        data.append(("jaxlib", _version("jaxlib")))
        data.append(("jax backend", jax.default_backend()))
        data.append(("devices", ", ".join(str(d) for d in jax.devices())))
        data.append(("process_index/count",
                     f"{jax.process_index()}/{jax.process_count()}"))
    except Exception as e:  # report instead of crash — env dumps must not fail
        data.append(("jax", f"error: {e}"))

    for mod in ("flax", "optax", "orbax.checkpoint", "PIL"):
        data.append((mod, _version(mod)))

    data.append(("platform", platform.platform()))
    for var in ("XLA_FLAGS", "JAX_PLATFORMS", "TPU_ACCELERATOR_TYPE"):
        if os.environ.get(var):
            data.append((var, os.environ[var]))

    width = max(len(k) for k, _ in data)
    return "\n".join(f"{k:<{width}}  {v}" for k, v in data)


def _version(mod_name: str) -> str:
    try:
        mod = importlib.import_module(mod_name)
        return getattr(mod, "__version__", "unknown")
    except ImportError:
        return "not installed"

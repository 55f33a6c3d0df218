"""Cross-process communication facade for single-controller JAX.

The reference (vidgen/utils/comm.py) wraps torch.distributed with NCCL/gloo
side-groups. Under JAX's single-controller SPMD model most of that vanishes:
device-level collectives are compiled into jitted functions (psum etc.), and
this module only exposes *host-process* helpers: rank/world size over
``jax.process_index``, barriers, and small-object all-gather via
``multihost_utils``. On a single host every function degrades to a no-op,
matching the reference's world_size==1 fast paths (comm.py:54-79).
"""

from typing import Any, List

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def get_local_rank() -> int:
    # one JAX process per host: local rank is always 0
    return 0


def get_local_size() -> int:
    return 1


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize() -> None:
    """Barrier across host processes (reference comm.py:122-136)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("lvt_tpu_barrier")


def all_gather(data: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every host process.

    Reference comm.py:139-177 uses a gloo side-group; here the object is
    pickled to bytes, padded to the global max length, and exchanged with
    ``multihost_utils.process_allgather`` on a uint8 array.
    ``process_allgather`` alone only handles uniform array pytrees —
    passing ragged per-host Python lists (e.g. per-video feature lists
    when the dataset size is not divisible by the process count) or
    dicts through it crashes or returns the wrong thing.
    """
    if get_world_size() == 1:
        return [data]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    lengths = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64))  # (world, 1)
    lengths = np.asarray(lengths).reshape(-1)
    max_len = int(lengths.max())
    padded = np.zeros((max_len,), np.uint8)
    padded[: payload.size] = payload
    rows = np.asarray(multihost_utils.process_allgather(padded))  # (world, max)
    return [pickle.loads(rows[i, : int(lengths[i])].tobytes())
            for i in range(rows.shape[0])]


def gather(data: Any, dst: int = 0) -> List[Any]:
    """Gather objects to one rank (others get [])."""
    if get_world_size() == 1:
        return [data]
    out = all_gather(data)
    return out if get_rank() == dst else []


def shared_random_seed() -> int:
    """A random seed shared across all host processes (reference comm.py:220)."""
    seed = np.random.randint(2 ** 31)
    return int(all_gather(seed)[0])


def reduce_dict(input_dict, average=True):
    """Reduce dict values (scalars/arrays) across processes (reference comm.py:234)."""
    world_size = get_world_size()
    if world_size < 2:
        return input_dict
    names = sorted(input_dict.keys())
    values = np.stack([np.asarray(input_dict[k], dtype=np.float64) for k in names])
    gathered = np.stack(all_gather(values)).sum(axis=0)
    if average:
        gathered = gathered / world_size
    return {k: v for k, v in zip(names, gathered)}

"""Device mesh construction and sharding helpers.

The reference's distributed story is one NCCL process per GPU with DDP
(vidgen/engine/launch.py:25-96). TPU-natively, the whole machine is one
single-controller JAX program: we build a ``jax.sharding.Mesh`` with a
``data`` axis (batch / DP) and a ``model`` axis (TP for attention heads and
codebook shards), annotate shardings with NamedSharding, and let XLA insert
ICI collectives. Multi-host uses ``jax.distributed.initialize`` before mesh
creation; nothing else changes.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def build_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, model) mesh.

    data=-1 means "all remaining devices". The device order from
    ``jax.devices()`` already follows the physical ICI torus on TPU, so a
    simple reshape keeps model-axis neighbors ICI-adjacent.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} needs more than {n} devices"
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def mesh_from_cfg(cfg) -> Mesh:
    return build_mesh(data=cfg.TPU.MESH_DATA, model=cfg.TPU.MESH_MODEL)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sequence/spatial parallelism for image batches (b, H, W, C): batch
    over `data`, image rows over `model`. XLA's SPMD partitioner inserts the
    halo exchanges the convolutions need (collective-permute over ICI) — the
    TPU-native equivalent of hand-written SP. No reference counterpart
    (SURVEY §2.10: SP row)."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays onto the mesh, batch-dim sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def local_device_count() -> int:
    return jax.local_device_count()


def device_count() -> int:
    return jax.device_count()

"""Launch helper (reference: vidgen/engine/launch.py:25-96).

The reference spawns one process per GPU and runs NCCL rendezvous. JAX is
single-controller SPMD: one Python process per *host* drives all local
devices, and multi-host jobs coordinate through
``jax.distributed.initialize`` (TPU pods auto-discover their topology; GPUs/
CPUs take coordinator_address/num_processes/process_id). So ``launch`` here
is just: optionally initialize the distributed runtime, then call main —
no process spawning, no port management.
"""

import logging
from typing import Optional, Tuple

logger = logging.getLogger(__name__)


def launch(
    main_func,
    *,
    multihost: bool = False,
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    args: Tuple = (),
):
    """Run main_func(*args) under the (optionally multi-host) JAX runtime."""
    if multihost:
        import jax

        kwargs = {}
        if coordinator_address is not None:
            kwargs.update(coordinator_address=coordinator_address,
                          num_processes=num_processes, process_id=process_id)
        elif num_processes is not None or process_id is not None:
            # silently auto-detecting a different topology than the caller
            # asked for is worse than failing
            raise ValueError(
                "launch(multihost=True) got num_processes/process_id without "
                "coordinator_address; pass all three, or none to let "
                "jax.distributed auto-detect the topology")
        jax.distributed.initialize(**kwargs)
        logger.info(
            f"jax.distributed initialized: process {jax.process_index()}"
            f"/{jax.process_count()}, {jax.local_device_count()} local devices")
    return main_func(*args)

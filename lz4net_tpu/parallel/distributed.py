"""Multi-host wiring: `jax.distributed` over DCN, same mesh code after.

The reference has no distributed layer at all (SURVEY.md §2.10); this is
net-new TPU architecture.  A multi-host run initialises the JAX
distributed runtime, after which `jax.devices()` spans the pod slice and
the `parallel.mesh`/`parallel.pipeline` code works unchanged — blocks
sharded over all chips, statistics psum'd over ICI/DCN, outputs gathered
in block order.
"""

from __future__ import annotations

import os

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialise the multi-host runtime (idempotent).

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) or TPU-pod auto-detection.
    """
    # Probe idempotence WITHOUT touching the XLA backend:
    # jax.process_count() would initialise it, after which
    # jax.distributed.initialize() refuses to run.
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["JAX_PROCESS_ID"])
    if kwargs:
        jax.distributed.initialize(**kwargs)


def is_multihost() -> bool:
    return jax.process_count() > 1

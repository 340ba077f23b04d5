"""Multi-host runtime initialisation.

The reference has no distributed backend at all (SURVEY.md §2: its only
multi-device mechanism is in-process nn.DataParallel). Here multi-host
is the standard JAX recipe: `jax.distributed.initialize` connects the
hosts, every host sees the global device set, and the same `Mesh` code
in parallel/mesh.py spans the slice — ICI inside a slice, DCN across
slices, with XLA inserting the collectives. Checkpoints (orbax) restore
onto whatever mesh the template carries, so elastic restart is: rerun
the trainer CLI with --resume on the new slice.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

from image_matching_tpu.utils.logging import get_logger

log = get_logger(__name__)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialise the multi-host runtime (no-op on a single host).

    Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID or the
    TPU metadata auto-detection inside jax.distributed.initialize).
    Returns a summary dict for logging.
    """
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    already = jax.process_count() > 1
    if explicit and not already:
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes
            or int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None,
            process_id=process_id
            if process_id is not None
            else (int(os.environ["JAX_PROCESS_ID"])
                  if "JAX_PROCESS_ID" in os.environ else None),
        )
    info = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
    log.info("distributed runtime: %s", info)
    return info


def is_primary() -> bool:
    """True on the host that should write checkpoints/logs."""
    return jax.process_index() == 0

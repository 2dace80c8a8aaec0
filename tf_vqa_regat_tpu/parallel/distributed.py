"""Multi-process (multi-host / multi-slice) initialization.

Within one slice, collectives ride ICI and need no setup beyond the mesh.
Across slices/hosts, JAX's standard runtime handles DCN once
`jax.distributed.initialize` has run (SURVEY §2.5 communication-backend row:
no custom transport layer). This wrapper reads the conventional environment
variables so `main.py` works unchanged under a multi-process launcher:

    REGAT_COORDINATOR=host:port  REGAT_NUM_PROCESSES=N  REGAT_PROCESS_ID=i

On Cloud TPU pods, `jax.distributed.initialize()` with no arguments
auto-discovers these; we call it bare when REGAT_AUTO_DISTRIBUTED=1.
"""

from __future__ import annotations

import os

import jax


def maybe_initialize() -> bool:
    """Initialize jax.distributed from env; returns True if initialized."""
    if os.environ.get("REGAT_AUTO_DISTRIBUTED") == "1":
        jax.distributed.initialize()
        return True
    coord = os.environ.get("REGAT_COORDINATOR")
    n = int(os.environ.get("REGAT_NUM_PROCESSES", "1"))
    if coord and n > 1:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=n,
            process_id=int(os.environ["REGAT_PROCESS_ID"]),
        )
        return True
    return False

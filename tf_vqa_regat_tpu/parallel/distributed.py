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
import numpy as np


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


def put_global(x, sharding):
    """Place a host array onto a (possibly multi-process) global sharding.

    Single-process: plain `jax.device_put`. Multi-process: a device_put
    against a sharding that spans non-addressable devices is invalid, so
    assemble the global jax.Array from per-LOCAL-device shards — each
    process transfers only the slices its own devices hold (SURVEY §2.5 DP
    row: per-host data feeding; this is the explicit-placement form of
    `jax.make_array_from_process_local_data`). Works for batch-sharded,
    table-replicated, and axis-sharded layouts alike because the slices
    come from `sharding.addressable_devices_indices_map`.
    """
    if sharding is None:
        return jax.device_put(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    arrs = [
        jax.device_put(x[idx], d)
        for d, idx in sharding.addressable_devices_indices_map(x.shape).items()
    ]
    return jax.make_array_from_single_device_arrays(x.shape, sharding, arrs)


def put_global_tree(tree, sharding):
    """`put_global` over a pytree; `sharding` is one sharding for all leaves
    or a matching pytree of shardings."""
    if isinstance(sharding, jax.sharding.Sharding) or sharding is None:
        return jax.tree.map(lambda v: put_global(v, sharding), tree)
    return jax.tree.map(put_global, tree, sharding)

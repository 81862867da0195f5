"""Multi-host (DCN) execution scaffolding.

The reference is a single Fortran process; the TPU build scales the state
axis first over ICI within a slice (parallel/sharded.py, ops/halo.py) and
then over DCN across hosts with JAX's multi-controller runtime.  This
module wires that second level:

  * :func:`initialize` — ``jax.distributed.initialize`` with environment
    autodetection (no-ops on a single host / inside managed TPU runtimes
    that pre-initialize).
  * :func:`global_mesh` — a 1-D mesh over ALL devices of all processes;
    pass it to :class:`~krylovfspssa_tpu.boxsolver.BoxCmeSolver` and the
    whole solve runs row-partitioned across hosts — the boundary halo of
    the last/first shard of neighbouring hosts rides DCN, everything else
    ICI.
  * :func:`host_gather` — gather a (possibly non-addressable) global
    array to a full numpy copy on every process; the box solver uses it
    for its rare host-side re-embeddings (box growth/shrink), which must
    see the full mask/vector.

Launch pattern (one process per host)::

    from krylovfspssa_tpu.parallel import multihost
    multihost.initialize()             # reads JAX_COORDINATOR_ADDRESS etc.
    mesh = multihost.global_mesh()
    solver = BoxCmeSolver(model, config, mesh=mesh)
    result = solver.solve(...)         # identical API; SPMD across hosts

Every process executes the same program; per-step scalars (the adaptive
carry) are replicated so host-side control flow stays consistent across
processes by construction (all processes branch on identical values).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the JAX multi-controller runtime (idempotent).

    Arguments default to the standard environment variables
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``); on managed TPU pods ``jax.distributed`` detects
    everything from the metadata server and no variables are needed.
    Returns True if a multi-process runtime is active afterwards.
    """
    explicit = coordinator_address is not None
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    # already-initialized check WITHOUT touching the XLA backend:
    # jax.process_count() would initialize it and make a subsequent
    # jax.distributed.initialize impossible
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return jax.process_count() > 1  # launcher already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        if explicit:
            raise  # a configured launch must not silently degrade
        # single host with no coordinator configured: run single-process
        return False
    return jax.process_count() > 1


def global_mesh(axis_name: str = "s"):
    """1-D mesh over every device of every process (the state axis)."""
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis_name,))


def host_gather(arr) -> np.ndarray:
    """Full numpy copy of a global array on every process.

    Single-host arrays (fully addressable) copy directly; multi-host
    arrays all-gather their shards over DCN first.
    """
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))

"""Multi-host (DCN) scaling helpers.

The reference is strictly single-process (SURVEY.md §2c).  For batch
jobs over many files / very long programs, the TPU framework scales
across hosts the JAX way: ``jax.distributed.initialize`` + a global
mesh whose inner axis rides ICI within a slice and whose outer axis
rides DCN across hosts.  Chunk batches shard over the combined axis;
weights stay replicated, so the only DCN traffic is the initial weight
broadcast and final gathers — the layout SURVEY.md §5 calls for.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Idempotent ``jax.distributed.initialize`` with env fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID)."""
    if getattr(initialize_distributed, "_done", False):
        return
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator is None:
        return  # single-process run; nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes or os.environ.get("NUM_PROCESSES", 1)),
        process_id=int(process_id or os.environ.get("PROCESS_ID", 0)),
    )
    initialize_distributed._done = True


def make_global_chunk_mesh() -> Mesh:
    """1-D global mesh over all processes' devices, axis 'chunk'.

    With jax's device ordering, consecutive devices within a host are
    adjacent, so a chunk batch sharded on this axis keeps most
    neighbor traffic on ICI and only host boundaries on DCN.
    """
    return Mesh(np.asarray(jax.devices()), axis_names=("chunk",))


def local_batch_slice(global_batch: int) -> slice:
    """The half-open range of a global chunk batch owned by this process."""
    n_proc = jax.process_count()
    per = -(-global_batch // n_proc)
    i = jax.process_index()
    return slice(i * per, min((i + 1) * per, global_batch))

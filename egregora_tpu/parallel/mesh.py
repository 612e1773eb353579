"""Device-mesh chunk parallelism — this domain's sequence parallelism.

The reference processes WOLA chunks strictly sequentially, one
GPU round-trip each (``egregora_audio_super_resolution.py:410-418``).
Chunks are independent, so the TPU-native design batches them and
shards the batch across the ICI mesh (SURVEY.md §2c/§5): weights
replicated, activations sharded on the leading 'chunk' axis, XLA
inserts no collectives at all until the host gathers the stitched
output.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_chunk_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or given) devices, axis name 'chunk'."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, axis_names=("chunk",))


def shard_chunks(mesh: Mesh, chunks: jnp.ndarray) -> jnp.ndarray:
    """Place ``[K, ...]`` with K sharded across the 'chunk' axis."""
    spec = P("chunk", *([None] * (chunks.ndim - 1)))
    return jax.device_put(chunks, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (weights) across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def chunk_parallel(fn: Callable, mesh: Mesh) -> Callable:
    """Compile ``fn(params, chunks[K, ...]) -> [K, ...]`` with the chunk
    batch sharded over the mesh and params replicated.

    The leading axis of every array input/output is partitioned on
    'chunk'; params stay replicated.  K must be a multiple of the mesh
    size (use ``ops.wola.chunk_batch(pad_to_multiple=mesh.size)``).
    """
    data_spec = P("chunk")
    jfn = jax.jit(
        fn,
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, data_spec)),
        out_shardings=NamedSharding(mesh, data_spec),
    )

    @functools.wraps(fn)
    def wrapped(params, chunks):
        return jfn(params, chunks)

    return wrapped

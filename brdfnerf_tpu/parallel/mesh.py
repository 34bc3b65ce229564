"""Device mesh + sharding helpers.

The reference is single-process single-GPU with host-side chunking as its
only batching strategy (SURVEY.md 2: no DP/TP/PP; --chunk loop at
main.py:120-141).  The TPU-native replacement is 1-D data parallelism over
ICI: rays shard along the batch axis, parameters replicate, and gradient
all-reduce is inserted by the XLA SPMD partitioner when the jitted loss
averages over the global batch.  At BRDF-NeRF scale (8x512 MLP, <= 128
samples/ray) DP over rays is the whole story — the model fits in a fraction
of one chip's HBM, so TP/PP would only add latency.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a pytree of (B, ...) arrays with B sharded over the mesh."""
    def put(x):
        spec = P(axis) if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (parameters / optimizer state)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def batch_sharding(mesh: Mesh, axis: str = "data"):
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())

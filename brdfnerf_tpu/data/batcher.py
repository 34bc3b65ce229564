"""Random minibatch sampling over the flat ray store.

Two variants replace the reference's torch DataLoader with 4 CPU workers
(main.py:170-184):

  RayBatcher        — host NumPy gather; each step's batch is copied
                      host->device by the caller.  Used on the mesh path,
                      where `shard_batch` wants host arrays to place one
                      shard per device.
  DeviceRayBatcher  — the store lives in DEVICE memory; each step uploads
                      only the (batch,) int32 index vector and runs ONE
                      jitted fused gather on device, so the per-step H2D
                      traffic is ~4*batch bytes instead of the whole batch
                      (rays 11f + rgbs 3f + depth arrays ~ 80+ bytes/ray).
                      Used on the single-device path.

Both draw identical index sequences for a given seed, so swapping them
never changes training results.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class RayBatcher:
    """Shuffled-epoch batcher over a dict of equally-sized (N, ...) arrays
    (host gather)."""

    def __init__(self, arrays: Dict[str, np.ndarray], batch_size: int,
                 seed: int = 0):
        self.arrays = arrays
        n = {k: v.shape[0] for k, v in arrays.items()}
        sizes = set(n.values())
        assert len(sizes) == 1, f"ragged ray store: {n}"
        self.n = sizes.pop()
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self._perm = self.rng.permutation(self.n)
        self._pos = 0

    @property
    def steps_per_epoch(self) -> int:
        return max(1, self.n // self.batch_size)

    def next_indices(self) -> np.ndarray:
        if self._pos + self.batch_size > self.n:
            self._perm = self.rng.permutation(self.n)
            self._pos = 0
        idx = self._perm[self._pos:self._pos + self.batch_size]
        self._pos += self.batch_size
        return idx

    def next_batch(self) -> Dict[str, np.ndarray]:
        idx = self.next_indices()
        return {k: v[idx] for k, v in self.arrays.items()}


class DeviceRayBatcher(RayBatcher):
    """Device-resident store + one fused on-device gather per step."""

    def __init__(self, arrays: Dict[str, np.ndarray], batch_size: int,
                 seed: int = 0, sharding=None):
        super().__init__(arrays, batch_size, seed)
        import jax
        import jax.numpy as jnp
        if sharding is not None:
            # mesh path: replicate the store across the devices so the
            # in-step gather with a 'data'-sharded index vector stays local
            self._store = {k: jax.device_put(v, sharding)
                           for k, v in arrays.items()}
        else:
            self._store = {k: jnp.asarray(v) for k, v in arrays.items()}
        # drop the host copy: the base class only needs it for its own
        # next_batch (unused here), and a satellite ray store is
        # O(GB) of host RAM that would otherwise stay pinned all run
        self.arrays = {}
        self._gather = jax.jit(
            lambda store, idx: jax.tree_util.tree_map(
                lambda a: jnp.take(a, idx, axis=0), store))

    @property
    def store(self) -> Dict:
        """The device-resident arrays (for fused in-step gathering)."""
        return self._store

    def next_batch(self) -> Dict:
        import jax.numpy as jnp
        idx = jnp.asarray(self.next_indices().astype(np.int32))
        return self._gather(self._store, idx)

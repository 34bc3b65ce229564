"""Random minibatch sampling over the flat ray store.

Three variants replace the reference's torch DataLoader with 4 CPU workers
(main.py:170-184):

  RayBatcher        — host NumPy gather; each step's batch is copied
                      host->device by the caller.  Used on the
                      host-gather escape-hatch path, where `shard_batch`
                      wants host arrays to place one shard per device.
  DeviceRayBatcher  — the store lives in DEVICE memory (replicated over a
                      mesh when one is given); each step uploads only the
                      (batch,) int32 index vector and runs ONE jitted
                      fused gather on device, so the per-step H2D traffic
                      is ~4*batch bytes instead of the whole batch (rays
                      11f + rgbs 3f + depth arrays ~ 80+ bytes/ray).
  ShardedRayBatcher — the store is SHARDED over the mesh's 'data' axis
                      (each device holds N/D rays), removing the
                      replication that caps dataset scale (a replicated
                      8.4M-ray store costs ~0.7 GB of HBM per device; a
                      sharded one 1/D of that).  Index draws are
                      per-shard: each device contributes batch/D rays
                      sampled without replacement from ITS shard
                      ("stratified over shards" — every ray is still
                      visited exactly once per local epoch), and the
                      in-program gather stays device-local via shard_map
                      (zero collectives added; the gradient all-reduce is
                      unchanged).

RayBatcher and DeviceRayBatcher draw identical index sequences for a given
seed, so swapping them never changes training results.  ShardedRayBatcher
defines a different (per-shard stratified) draw order; its trajectory
equals a replicated run replaying the SAME draws via `global_indices`
(pinned in tests/test_sharding.py).
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


class ShardedRayBatcher:
    """Device store sharded over the mesh 'data' axis + per-shard index
    draws (see module docstring).

    The store is padded to a device multiple by WRAPPING (rows 0..pad-1
    appended, pad < n_devices... strictly pad < shard count), so the
    duplicated rays are sampled at most once more per local epoch —
    negligible at dataset scale and exact when N % D == 0.

    next_indices() returns LOCAL per-shard indices laid out as D
    contiguous blocks of batch/D — the layout jit's P('data') sharding of
    the index vector maps onto the mesh, so block d lands on device d and
    indexes device d's shard.  global_indices(local) converts a draw to
    indices into the padded global store for replicated-replay equality
    tests.
    """

    def __init__(self, arrays: Dict[str, np.ndarray], batch_size: int,
                 mesh, seed: int = 0, axis: str = "data",
                 place: bool = True):
        """place=False skips the device placement and keeps the (padded)
        store host-side — for index-sequence-only uses (a canonical draw
        generator, replicated-replay tests); `mesh` then only needs a
        `.shape[axis]` shard count."""
        n = {k: v.shape[0] for k, v in arrays.items()}
        sizes = set(n.values())
        assert len(sizes) == 1, f"ragged ray store: {n}"
        self.n = sizes.pop()
        d = int(mesh.shape[axis])
        if batch_size % d:
            raise ValueError(
                f"batch_size {batch_size} not divisible by the {d}-device "
                f"'{axis}' mesh axis")
        self.n_shards = d
        self.local_batch = batch_size // d
        self.batch_size = batch_size
        self.shard_size = -(-self.n // d)          # ceil
        if self.n < d:
            # wrap-padding appends rows 0..pad-1 once, so it can only fill
            # up to 2n rows — a store smaller than the mesh would come out
            # ragged (and makes no sense to shard)
            raise ValueError(
                f"ray store has {self.n} rays but the '{axis}' mesh axis "
                f"has {d} shards; need at least one ray per shard")
        if self.local_batch > self.shard_size:
            # next_indices would silently clamp to shard_size columns and
            # surface later as a confusing jit shape mismatch
            raise ValueError(
                f"per-shard batch {self.local_batch} (batch_size "
                f"{batch_size} / {d} shards) exceeds the per-shard store "
                f"size {self.shard_size} (store {self.n} rays); shrink "
                f"batch_size or grow the store")
        self._store = {}
        if place:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(mesh, P(axis))
            for k, v in self.padded_arrays(arrays).items():
                self._store[k] = jax.device_put(v, sh)
        self.rng = np.random.default_rng(seed)
        self._perms = self._new_perms()
        self._pos = 0

    def _new_perms(self) -> np.ndarray:
        return np.stack([self.rng.permutation(self.shard_size)
                         for _ in range(self.n_shards)])

    @property
    def store(self) -> Dict:
        return self._store

    @property
    def steps_per_epoch(self) -> int:
        return max(1, self.shard_size // self.local_batch)

    def next_indices(self) -> np.ndarray:
        if self._pos + self.local_batch > self.shard_size:
            self._perms = self._new_perms()
            self._pos = 0
        out = self._perms[:, self._pos:self._pos + self.local_batch]
        self._pos += self.local_batch
        return np.ascontiguousarray(out.reshape(-1)).astype(np.int32)

    def global_indices(self, local: np.ndarray) -> np.ndarray:
        """Local per-shard draw -> indices into the PADDED global store
        (shard d's rows live at [d*shard_size, (d+1)*shard_size))."""
        blocks = local.reshape(self.n_shards, -1).astype(np.int64)
        offs = np.arange(self.n_shards, dtype=np.int64)[:, None]
        return (blocks + offs * self.shard_size).reshape(-1)

    def padded_arrays(self, arrays: Dict[str, np.ndarray]) -> Dict:
        """The host-side padded twin of the sharded store (for
        replicated-replay equality tests)."""
        pad = self.shard_size * self.n_shards - self.n
        if not pad:
            return dict(arrays)
        return {k: np.concatenate([v, v[:pad]], axis=0)
                for k, v in arrays.items()}

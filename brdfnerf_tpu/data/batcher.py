"""Random minibatch sampling from a device-resident flat ray store.

Replaces the reference's torch DataLoader with 4 CPU workers
(main.py:170-184): rays are generated once at ingestion, pushed to device
memory, and each step gathers a random index set — one fused gather on
device instead of a host->device copy per batch.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class RayBatcher:
    """Shuffled-epoch batcher over a dict of equally-sized (N, ...) arrays."""

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

    def next_batch(self) -> Dict[str, np.ndarray]:
        if self._pos + self.batch_size > self.n:
            self._perm = self.rng.permutation(self.n)
            self._pos = 0
        idx = self._perm[self._pos:self._pos + self.batch_size]
        self._pos += self.batch_size
        return {k: v[idx] for k, v in self.arrays.items()}

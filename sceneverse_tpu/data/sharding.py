"""Per-process (multi-host) dataset sharding + eval remainder semantics.

The reference runs one dataloader per DDP rank via a DistributedSampler that
pads every rank to equal length by wrapping around, then drops the duplicated
tail samples at metric time (``gather_for_metrics`` re-implementation,
reference common/misc.py:84-132). Two equivalent-by-construction modes here:

* ``shard_indices(n, world, rank)`` (default, ``pad=False``) — contiguous
  UNEVEN shards: every sample appears on exactly one process, tail processes
  may hold one sample fewer. The evaluator's (value, count) protocol
  (evaluator/build.py) then sums exact per-process counts across hosts, so
  ratios equal the reference's truncated-gather result with no masking
  needed. This is the TPU-native choice: no in-graph lockstep is required
  because eval forwards are per-host and only ``record()`` synchronizes.

* ``pad=True`` — reference-shaped equal-length shards padded by wraparound,
  plus a validity mask marking the duplicated tail, for callers that need
  rank-symmetric batch counts (e.g. an eval step that does cross-host
  collectives per batch). Masking (value, count) by validity reproduces
  ``gather_for_metrics`` truncation exactly.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def shard_indices(n: int, world: int, rank: int,
                  pad: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Indices (and validity mask) of ``rank``'s shard of ``range(n)``.

    Returns (indices, valid) with ``valid[i]`` False only for wraparound
    padding (pad=True). Union of valid indices over ranks == range(n),
    disjoint — each sample is counted exactly once.
    """
    if not 0 <= rank < world:
        raise ValueError(f"rank {rank} outside world {world}")
    if not pad:
        # contiguous uneven split: first (n % world) ranks get one extra
        base, extra = divmod(n, world)
        start = rank * base + min(rank, extra)
        size = base + (1 if rank < extra else 0)
        idx = np.arange(start, start + size)
        return idx, np.ones(size, bool)
    per_rank = -(-n // world) if n else 0  # ceil
    idx = np.arange(rank * per_rank, (rank + 1) * per_rank)
    valid = idx < n
    idx = np.where(valid, idx, idx % max(n, 1))
    return idx, valid


class ShardedDataset:
    """View of a dataset restricted to this process's shard (uneven mode)."""

    def __init__(self, dataset, world: int, rank: int):
        self.dataset = dataset
        self.indices, _ = shard_indices(len(dataset), world, rank)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[int(self.indices[i])]

    def __getattr__(self, name):
        # delegate collate/meta attributes (e.g. answer vocabs) to the base.
        # Guard dunders and 'dataset' itself: during unpickling (spawn
        # DataLoader workers) lookups happen before __dict__ is restored and
        # unconditional delegation would recurse; hijacking __getstate__ /
        # __reduce__ would also corrupt pickling on older Pythons.
        if name.startswith("__") or name == "dataset":
            raise AttributeError(name)
        return getattr(self.dataset, name)

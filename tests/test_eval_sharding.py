"""Multi-host eval remainder semantics (VERDICT round-1 item 9) —
simulated process counts, no real multi-host needed.

The reference pads per-rank eval loaders to equal length (DistributedSampler
wraparound) and truncates the duplicated tail when gathering metrics
(``gather_for_metrics``, reference common/misc.py:84-132). Proves both of our
modes reproduce that result exactly: uneven exact shards + (value,count)
sums, and padded shards + validity masking.
"""

import numpy as np
import pytest

from sceneverse_tpu.data.sharding import ShardedDataset, shard_indices


@pytest.mark.parametrize("n", [0, 1, 7, 8, 10, 31])
@pytest.mark.parametrize("world", [1, 2, 3, 4, 8])
def test_uneven_shards_partition_exactly(n, world):
    seen = []
    sizes = []
    for rank in range(world):
        idx, valid = shard_indices(n, world, rank)
        assert valid.all()
        seen.extend(idx.tolist())
        sizes.append(len(idx))
    assert sorted(seen) == list(range(n))
    assert max(sizes) - min(sizes) <= 1  # balanced to within one sample


@pytest.mark.parametrize("n", [1, 7, 10, 31])
@pytest.mark.parametrize("world", [1, 3, 4])
def test_padded_shards_mask_duplicates(n, world):
    per_rank = -(-n // world)
    real = []
    for rank in range(world):
        idx, valid = shard_indices(n, world, rank, pad=True)
        assert len(idx) == per_rank  # rank-symmetric batch counts
        assert (idx < n).all()  # wraparound stays in range
        real.extend(idx[valid].tolist())
    assert sorted(real) == list(range(n))  # masked union = exactly once


def test_simulated_process_metrics_match_global():
    """Per-process (value,count) sums over shards == global metric ==
    reference's truncated gather, for both sharding modes."""
    rng = np.random.RandomState(0)
    n, world = 23, 4
    correct = rng.rand(n) < 0.37  # per-sample 0/1 metric

    global_acc = correct.mean()

    # mode 1: uneven exact shards, plain (value,count) sums
    v = c = 0.0
    for rank in range(world):
        idx, _ = shard_indices(n, world, rank)
        v += correct[idx].sum()
        c += len(idx)
    assert v / c == pytest.approx(global_acc)

    # mode 2: reference-shaped padded shards + validity masking
    v = c = 0.0
    for rank in range(world):
        idx, valid = shard_indices(n, world, rank, pad=True)
        v += (correct[idx] * valid).sum()
        c += valid.sum()
    assert v / c == pytest.approx(global_acc)

    # unmasked padded sums would double-count the wrapped tail — the very
    # bug gather_for_metrics truncation exists to fix
    v = c = 0.0
    for rank in range(world):
        idx, _ = shard_indices(n, world, rank, pad=True)
        v += correct[idx].sum()
        c += len(idx)
    assert c == world * (-(-n // world)) != n


def test_sharded_dataset_view():
    class Toy:
        meta = "answer_vocab"

        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": i}

    ds = ShardedDataset(Toy(), world=3, rank=2)
    assert len(ds) == 3
    assert [ds[i]["x"] for i in range(len(ds))] == [7, 8, 9]
    assert ds.meta == "answer_vocab"  # attribute delegation

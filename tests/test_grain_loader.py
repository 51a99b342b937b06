"""GrainLoader: determinism, sharding, epoch reshuffle, batch stacking."""

import numpy as np
import pytest

pytest.importorskip("grain")

from bfsr_tpu.data.grain_loader import GrainLoader, make_loader  # noqa: E402


class _DS:
    def __init__(self, n=12):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2, 2), i, np.float32), "idx": np.int64(i)}


def _indices(loader):
    return [int(v) for b in loader for v in np.ravel(b["idx"])]


def test_batches_and_order_deterministic():
    a = GrainLoader(_DS(), batch_size=3, shuffle=True, seed=7,
                    shard_index=0, shard_count=1)
    b = GrainLoader(_DS(), batch_size=3, shuffle=True, seed=7,
                    shard_index=0, shard_count=1)
    ia, ib = _indices(a), _indices(b)
    assert sorted(ia) == list(range(12))
    assert ia == ib  # same seed, same epoch -> same order
    batch = next(iter(GrainLoader(_DS(), batch_size=4, shard_index=0,
                                  shard_count=1)))
    assert batch["x"].shape == (4, 2, 2)


def test_epoch_reshuffle_deterministic():
    a = GrainLoader(_DS(), batch_size=3, shuffle=True, seed=7,
                    shard_index=0, shard_count=1)
    e0, e1 = _indices(a), _indices(a)
    assert sorted(e0) == sorted(e1)
    assert e0 != e1  # reshuffled across epochs
    # a fresh loader replays the same epoch sequence
    b = GrainLoader(_DS(), batch_size=3, shuffle=True, seed=7,
                    shard_index=0, shard_count=1)
    assert _indices(b) == e0 and _indices(b) == e1


def test_host_sharding_disjoint_and_complete():
    shards = [
        _indices(GrainLoader(_DS(), batch_size=2, shuffle=True, seed=3,
                             shard_index=i, shard_count=2))
        for i in range(2)
    ]
    assert not (set(shards[0]) & set(shards[1]))
    assert sorted(shards[0] + shards[1]) == list(range(12))
    assert len(GrainLoader(_DS(), batch_size=2, shard_index=0,
                           shard_count=2)) == 3


@pytest.mark.parametrize("n,count,bs,drop", [(13, 3, 2, False), (13, 3, 2, True),
                                             (12, 3, 2, False), (14, 4, 3, False)])
def test_len_matches_iteration_per_shard(n, count, bs, drop):
    """len() must equal the number of batches grain actually yields on EVERY
    shard — measured: the DataLoader yields floor(n/count) records per shard
    even with drop_remainder=False, so a ceil-based len() overstates the
    step count and desyncs steps-per-epoch bookkeeping across hosts."""
    for idx in range(count):
        ld = GrainLoader(_DS(n), batch_size=bs, shuffle=False, seed=0,
                         shard_index=idx, shard_count=count, drop_last=drop)
        assert len(ld) == sum(1 for _ in ld), (idx, count)


def test_make_loader_backends():
    g = make_loader(_DS(), backend="grain", batch_size=2, shard_index=0,
                    shard_count=1)
    t = make_loader(_DS(), backend="threads", batch_size=2, num_workers=1)
    assert sorted(_indices(g)) == sorted(_indices(t)) == list(range(12))
    with pytest.raises(ValueError):
        make_loader(_DS(), backend="nope")

"""Grain-backed input pipeline (multi-host training option).

The thread-pool ``DataLoader`` (loader.py) keeps one host's accelerator
fed; for multi-host data parallelism the input pipeline additionally
needs per-host sharding of a deterministic global shuffle (each host
must draw a disjoint slice of the same permutation every epoch) and
worker *processes* (true parallelism for PIL decode under heavy CPU
load).  Google Grain provides exactly that on top of our map-style
datasets: this wraps any indexable dataset/wrapper in a
``grain.DataLoader`` with the same ergonomics as loader.DataLoader —
each ``iter()`` is one epoch, reshuffled deterministically from
``seed + epoch`` so every host sees the same permutation.

The reference stack has no multi-host story (torch DataLoader +
nn.DataParallel, LINF-LP/train.py:199-207); this is the TPU-native
upgrade path.  Use via ``loader: grain`` in a train config or construct
directly.
"""

import numpy as np


class _Source:
    """grain RandomAccessDataSource view of a map-style dataset."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self):
        return len(self._dataset)

    def __getitem__(self, idx):
        return self._dataset[int(idx)]


class GrainLoader:
    """Drop-in twin of loader.DataLoader backed by grain.

    shard_index/shard_count: this host's slice of the global shuffle.
    Default to ``jax.process_index()``/``jax.process_count()`` so a
    multi-host dp launch shards automatically; pass 0/1 to disable.
    Every ``iter()`` call is a new epoch: the global permutation is
    reseeded with ``seed + epoch`` (identical across hosts, disjoint
    slices per host).
    """

    def __init__(self, dataset, batch_size=1, shuffle=False, drop_last=False,
                 num_workers=0, seed=0, shard_index=None, shard_count=None,
                 read_buffer=8):
        if shard_index is None or shard_count is None:
            import jax

            shard_index = jax.process_index()
            shard_count = jax.process_count()
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.read_buffer = read_buffer
        self._seed = int(seed) if seed is not None else 0
        self._shard = (shard_index, shard_count)
        self._epoch = 0
        self._source = _Source(dataset)

    def _make(self, seed):
        import grain.python as grain

        sampler = grain.IndexSampler(
            num_records=len(self.dataset),
            shuffle=self.shuffle,
            seed=seed,
            shard_options=grain.ShardOptions(
                shard_index=self._shard[0], shard_count=self._shard[1],
                drop_remainder=self.drop_last),
            num_epochs=1,
        )
        return grain.DataLoader(
            data_source=self._source,
            sampler=sampler,
            operations=[grain.Batch(batch_size=self.batch_size,
                                    drop_remainder=self.drop_last)],
            worker_count=self.num_workers,
            read_options=grain.ReadOptions(
                prefetch_buffer_size=self.read_buffer),
        )

    def __len__(self):
        # Measured grain semantics (0.2.15): the DataLoader yields exactly
        # floor(n/count) records on EVERY shard regardless of ShardOptions'
        # drop_remainder (uneven-shard extras never surface), so all hosts
        # see the same step count; drop_last only governs the partial batch.
        n = len(self.dataset) // self._shard[1]
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        loader = self._make(self._seed + self._epoch)
        self._epoch += 1
        return iter(loader)


def make_loader(dataset, backend="threads", **kw):
    """Construct a loader: ``threads`` (default, loader.DataLoader) or
    ``grain`` (GrainLoader; requires the grain package)."""
    if backend == "grain":
        return GrainLoader(dataset, **kw)
    if backend == "threads":
        from bfsr_tpu.data.loader import DataLoader

        kw.pop("shard_index", None)
        kw.pop("shard_count", None)
        return DataLoader(dataset, **kw)
    raise ValueError(f"unknown loader backend: {backend}")

"""Batched data loader with background-thread prefetch.

Replaces torch's worker-process DataLoader with a thread pool: the wrappers
are numpy/PIL (GIL released in the hot paths) and TPU input pipelines are
host-CPU-bound on decode/resize, so threads + prefetch keep the accelerator
fed without pickling overhead.  Yields dicts of stacked numpy arrays.
"""

import queue
import threading

import numpy as np


def _stack(samples):
    out = {}
    for k in samples[0]:
        out[k] = np.stack([s[k] for s in samples], axis=0)
    return out


class DataLoader:
    def __init__(self, dataset, batch_size=1, shuffle=False, drop_last=False,
                 num_workers=4, prefetch=4, seed=None, collate_fn=_stack):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.collate_fn = collate_fn
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        end = len(idx) - (len(idx) % self.batch_size) if self.drop_last else len(idx)
        for i in range(0, end, self.batch_size):
            yield idx[i: i + self.batch_size]

    def __iter__(self):
        batches = list(self._batches())
        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        it_lock = threading.Lock()
        batch_iter = iter(enumerate(batches))
        results = {}
        results_lock = threading.Lock()
        next_emit = [0]

        def worker():
            while not stop.is_set():
                with it_lock:
                    try:
                        bi, batch_idx = next(batch_iter)
                    except StopIteration:
                        return
                try:
                    samples = [self.dataset[int(i)] for i in batch_idx]
                    result = self.collate_fn(samples)
                except Exception as e:  # propagate to consumer
                    result = e
                with results_lock:
                    results[bi] = result
                # bounded put that re-checks stop: a consumer that quits
                # early (--limit break, exception) would otherwise leave
                # workers blocked forever on a full queue
                while not stop.is_set():
                    try:
                        q.put(bi, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            emitted = 0
            pending = {}
            while emitted < len(batches):
                bi = q.get()
                with results_lock:
                    pending[bi] = results.pop(bi)
                while next_emit[0] in pending:
                    item = pending.pop(next_emit[0])
                    next_emit[0] += 1
                    emitted += 1
                    if isinstance(item, Exception):
                        raise item
                    yield item
        finally:
            stop.set()

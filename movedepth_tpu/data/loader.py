"""Sharded, threaded, prefetching batch loader (host side).

Replaces torch DataLoader + DistributedSampler
(reference: movedepth/trainer.py:166-198; utils.py:45-48,73-87):

  * ShardedIndexSampler reproduces the reference's two sampler behaviors:
    epoch-seeded shuffle with strided ``indices[rank::world]`` sharding
    (val sampler, utils.py:79-87) and drop-last batching (train loader);
  * Loader decodes samples on a thread pool (PIL/numpy release the GIL)
    and keeps a bounded prefetch queue of collated numpy batches -- the
    TPU equivalent of num_workers=12 + pin_memory;
  * device_prefetch overlaps H2D transfer with compute, the single-host
    counterpart of a per-host sharded input pipeline (multi-host: give
    each host its rank/world and per-host batch slice).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Sequence

import numpy as np


class ShardedIndexSampler:
    """Epoch-seeded, rank-sharded index stream."""

    def __init__(self, n: int, batch_size: int, rank: int = 0,
                 world_size: int = 1, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 1):
        self.n = n
        self.batch_size = batch_size
        self.rank = rank
        self.world_size = world_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed

    def epoch_indices(self, epoch: int) -> np.ndarray:
        if self.shuffle:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch]))
            idx = rng.permutation(self.n)
        else:
            idx = np.arange(self.n)
        idx = idx[self.rank::self.world_size]
        if self.drop_last:
            idx = idx[: len(idx) // self.batch_size * self.batch_size]
        return idx

    def batches(self, epoch: int) -> List[np.ndarray]:
        idx = self.epoch_indices(epoch)
        return [idx[i:i + self.batch_size]
                for i in range(0, len(idx), self.batch_size)]

    def __len__(self) -> int:
        per_rank = len(range(self.rank, self.n, self.world_size))
        if self.drop_last:
            return per_rank // self.batch_size
        return -(-per_rank // self.batch_size)


def collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples], 0) for k in keys}


class Loader:
    """Threaded prefetching loader over a map-style dataset."""

    def __init__(self, dataset, batch_size: int, rank: int = 0,
                 world_size: int = 1, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 8,
                 prefetch: int = 4, seed: int = 1):
        self.dataset = dataset
        self.sampler = ShardedIndexSampler(
            len(dataset), batch_size, rank, world_size, shuffle, drop_last,
            seed)
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch

    def __len__(self) -> int:
        return len(self.sampler)

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)
        batches = self.sampler.batches(epoch)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                # two batches in flight: decode batch i+1 while i is queued
                futs = []
                for b in batches:
                    futs.append([pool.submit(self.dataset.__getitem__, int(i))
                                 for i in b])
                    while len(futs) > 2:
                        done = futs.pop(0)
                        if stop.is_set():
                            return
                        q.put(collate([f.result() for f in done]))
                for done in futs:
                    if stop.is_set():
                        return
                    q.put(collate([f.result() for f in done]))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


def device_prefetch(iterator, put_fn, depth: int = 2):
    """Keep ``depth`` batches resident on device ahead of the consumer."""
    import collections

    buf = collections.deque()
    for batch in iterator:
        buf.append(put_fn(batch))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()

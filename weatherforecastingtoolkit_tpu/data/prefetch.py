"""Host batching + device prefetch.

Replaces the torch DataLoader + Lightning transfer machinery (reference
pipeline/datasets/sevir/sevir.py:1206-1222) with a TPU-idiomatic pipeline:

  SEVIRDataset (map-style, numpy) --thread pool--> stacked host batches
      --double-buffered jax.device_put--> device-resident batches

* h5py/numpy release the GIL, so a thread pool (not torch's fork workers)
  saturates disk while staying in-process (no IPC serialization).
* `device_prefetch` keeps `prefetch` batches in flight on device so the
  accelerator never waits on PCIe: while step N computes, batch N+1 is
  already transferring.
* Sharding-aware: pass a NamedSharding to lay each global batch out across
  the DP mesh directly from host memory (jax.device_put handles the split).
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
import threading
from typing import Callable, Dict, Iterable, Iterator, Optional, Sequence

import jax
import numpy as np


def collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack samples at a new leading (batch) axis."""
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples], axis=0) for k in keys}


class BatchLoader:
    """Iterates batches from a map-style dataset using a thread pool.

    drop_last=True yields only full batches (the reference's `__len__ =
    total // batch_size` floor semantics, sevir/sevir.py:534-538).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, num_workers: int = 4, drop_last: bool = True,
                 collate_fn: Callable = collate):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(
                np.random.SeedSequence([self.seed, self._epoch])).permutation(n)
        limit = (n // self.batch_size) * self.batch_size if self.drop_last else n
        order = order[:limit]

        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # window the index stream into batches; keep ~2 batches in flight
            batches = [order[i:i + self.batch_size]
                       for i in range(0, len(order), self.batch_size)]
            pending = collections.deque()
            idx = 0

            def submit(batch_ids):
                return [pool.submit(self.dataset.__getitem__, int(i)) for i in batch_ids]

            while idx < len(batches) and len(pending) < 2:
                pending.append(submit(batches[idx])); idx += 1
            while pending:
                futs = pending.popleft()
                if idx < len(batches):
                    pending.append(submit(batches[idx])); idx += 1
                yield self.collate_fn([f.result() for f in futs])


def device_prefetch(host_iter: Iterable, prefetch: int = 2,
                    sharding: Optional[jax.sharding.Sharding] = None,
                    ) -> Iterator:
    """Wrap a host-batch iterator with asynchronous device placement."""
    put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
        else jax.device_put

    queue = collections.deque()
    it = iter(host_iter)
    lock = threading.Lock()

    def enqueue(n):
        with lock:
            for _ in range(n):
                try:
                    batch = next(it)
                except StopIteration:
                    return
                queue.append(jax.tree_util.tree_map(put, batch))

    enqueue(prefetch)
    while queue:
        batch = queue.popleft()
        enqueue(1)
        yield batch

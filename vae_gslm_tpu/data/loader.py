"""Prefetching data loader (thread pool, CPU-side).

Replaces torch ``DataLoader`` worker processes
(``training_lib/trainer.py:50-111``).  Dataset ``__getitem__`` is pure
numpy, so a thread pool overlaps file IO / mel extraction with TPU
steps; ``prefetch`` batches are staged ahead.  A C++ decode/resample
fast path can be slotted into the dataset later without touching this.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional

from .sampler import Sampler


class DataLoader:
    def __init__(self, dataset, sampler: Sampler,
                 collate_fn: Optional[Callable] = None,
                 num_workers: int = 4, prefetch: int = 4):
        self.dataset = dataset
        self.sampler = sampler
        self.collate_fn = collate_fn or dataset.seq_collate
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch

    def _make_batch(self, indices) -> Dict[str, Any]:
        return self.collate_fn([self.dataset[i] for i in indices])

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        batch_indices = list(iter(self.sampler))
        if not batch_indices:
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                futures = [pool.submit(self._make_batch, b)
                           for b in batch_indices]
                for fut in futures:
                    if stop.is_set():
                        for f in futures:
                            f.cancel()
                        return
                    q.put(fut.result())
            q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()

    def __len__(self) -> int:
        try:
            return len(self.sampler)
        except TypeError:
            return sum(1 for _ in iter(self.sampler))

"""Batch samplers: standard / length-bucketed / token-budget, each with a
deterministic distributed variant.

Parity target: ``/root/reference/data/sampler.py``.  The distributed
variants keep the reference's deterministic per-epoch seeded shuffles and
rank subsampling — on TPU this seeds per-host data sharding
(``jax.process_index()`` plays the DDP rank).
"""
from __future__ import annotations

import logging
import math
import random
from typing import Iterator, List, Optional

import numpy as np

log = logging.getLogger(__name__)


class Sampler:
    def __iter__(self) -> Iterator[List[int]]:
        raise NotImplementedError

    def set_epoch(self, epoch: int) -> None:
        pass


class SequentialSampler(Sampler):
    def __init__(self, n: int, batch_size: int, drop_last: bool = False):
        self.n, self.batch_size, self.drop_last = n, batch_size, drop_last

    def __iter__(self):
        idx = list(range(self.n))
        for i in range(0, self.n, self.batch_size):
            b = idx[i: i + self.batch_size]
            if len(b) < self.batch_size and self.drop_last:
                return
            yield b

    def __len__(self):
        if self.drop_last:
            return self.n // self.batch_size
        return math.ceil(self.n / self.batch_size)


class RandomSampler(Sampler):
    def __init__(self, n: int, batch_size: int, drop_last: bool = False,
                 seed: Optional[int] = None):
        self.n, self.batch_size, self.drop_last = n, batch_size, drop_last
        self.rng = random.Random(seed)

    def __iter__(self):
        idx = list(range(self.n))
        self.rng.shuffle(idx)
        for i in range(0, self.n, self.batch_size):
            b = idx[i: i + self.batch_size]
            if len(b) < self.batch_size and self.drop_last:
                return
            yield b

    def __len__(self):
        if self.drop_last:
            return self.n // self.batch_size
        return math.ceil(self.n / self.batch_size)


class DistributedSampler(Sampler):
    """Epoch-seeded shuffle + rank subsample (torch DistributedSampler
    semantics used by ``sampler.py:9-24``)."""

    def __init__(self, n: int, batch_size: int, world_size: int, rank: int,
                 shuffle: bool = True, drop_last: bool = True,
                 seed: int = 0):
        assert 0 <= rank < world_size
        self.n, self.batch_size = n, batch_size
        self.world_size, self.rank = world_size, rank
        self.shuffle, self.drop_last, self.seed = shuffle, drop_last, seed
        self.epoch = 0
        if drop_last and n % world_size:
            self.num_samples = n // world_size
        else:
            self.num_samples = math.ceil(n / world_size)
        self.total_size = self.num_samples * world_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self):
        idx = list(range(self.n))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idx)
        if self.drop_last:
            idx = idx[: self.total_size]
        else:
            idx += idx[: self.total_size - len(idx)]
        idx = idx[self.rank: self.total_size: self.world_size]
        for i in range(0, len(idx), self.batch_size):
            b = idx[i: i + self.batch_size]
            if len(b) < self.batch_size and self.drop_last:
                return
            yield b

    def __len__(self):
        if self.drop_last:
            return self.num_samples // self.batch_size
        return math.ceil(self.num_samples / self.batch_size)


def _bucketize(lengths: List[float], nbuckets: int,
               descending: bool) -> List[np.ndarray]:
    order = np.argsort([-x for x in lengths] if descending else lengths)
    split = len(order) // nbuckets
    buckets = [order[i * split: (i + 1) * split] for i in range(nbuckets)]
    if nbuckets * split < len(order):
        buckets.append(order[nbuckets * split:])
    return [list(b) for b in buckets]


def _greedy_batches(indices: List[int], lengths: List[float],
                    batch_size: Optional[int],
                    batch_length: Optional[float],
                    drop_last: bool) -> List[List[int]]:
    """Batch by count or by total-padded-length budget
    (``sampler.py:71-90``)."""
    batches, batch, max_len = [], [], 0.0
    for idx in indices:
        batch.append(idx)
        max_len = max(lengths[idx], max_len)
        if batch_size is not None:
            if len(batch) >= batch_size:
                batches.append(batch)
                batch, max_len = [], 0.0
        else:
            if max_len * len(batch) > batch_length and batch[:-1]:
                batches.append(batch[:-1])
                batch = [batch[-1]]
                max_len = lengths[idx]
    if batch and not drop_last:
        batches.append(batch)
    return batches


class SingleRandomBucketSampler(Sampler):
    """Sort-by-length buckets, shuffled batching
    (``sampler.py:50-91``)."""

    def __init__(self, nbuckets: int, lengths: List[float],
                 batch_size: Optional[int] = None,
                 batch_length: Optional[float] = None,
                 drop_last: bool = True, seed: Optional[int] = None):
        assert (batch_size is None) != (batch_length is None)
        self.lengths = lengths
        self.batch_size, self.batch_length = batch_size, batch_length
        self.drop_last = drop_last
        self.buckets = _bucketize(lengths, nbuckets, descending=True)
        self.rng = random.Random(seed)

    def __iter__(self):
        self.rng.shuffle(self.buckets)
        for b in self.buckets:
            self.rng.shuffle(b)
        idxs = [i for b in self.buckets for i in b]
        batches = _greedy_batches(idxs, self.lengths, self.batch_size,
                                  self.batch_length, self.drop_last)
        self.rng.shuffle(batches)
        return iter(batches)


class DistributedRandomBucketSampler(Sampler):
    """Deterministic per-epoch bucketed batching + rank subsample
    (``sampler.py:94-164``)."""

    def __init__(self, nbuckets: int, lengths: List[float],
                 world_size: int, rank: int,
                 batch_size: Optional[int] = None,
                 batch_length: Optional[float] = None,
                 drop_last: bool = True, seed: int = 1234):
        if rank >= world_size or rank < 0:
            raise ValueError(f"invalid rank {rank}")
        assert (batch_size is None) != (batch_length is None)
        self.lengths = lengths
        self.batch_size, self.batch_length = batch_size, batch_length
        self.buckets = _bucketize(lengths, nbuckets, descending=False)
        self.world_size, self.rank = world_size, rank
        self.epoch, self.seed = 0, seed

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self):
        # Deterministic (epoch-seeded) shuffles — identical on all hosts.
        random.Random(self.epoch + self.seed).shuffle(self.buckets)
        for i, b in enumerate(self.buckets):
            random.Random(self.epoch + self.seed + i * 5).shuffle(b)
        idxs = [i for b in self.buckets for i in b]
        batches = _greedy_batches(idxs, self.lengths, self.batch_size,
                                  self.batch_length, drop_last=True)
        num_samples = math.ceil(
            (len(batches) - self.world_size) / self.world_size)
        total = num_samples * self.world_size
        batches = batches[:total]
        batches = batches[self.rank * num_samples:
                          (self.rank + 1) * num_samples]
        assert len(batches) == num_samples
        random.shuffle(batches)
        return iter(batches)


class SingleConcatLengthSampler(Sampler):
    """Token-budget batching (``sampler.py:186-207``)."""

    def __init__(self, batch_size: int, max_length: float,
                 lengths: List[float], seed: Optional[int] = None):
        self.lengths = lengths
        self.total_length = batch_size * max_length
        self.rng = random.Random(seed)

    def __iter__(self):
        idxs = list(range(len(self.lengths)))
        self.rng.shuffle(idxs)
        batches, batch, sum_len = [], [], 0.0
        for idx in idxs:
            batch.append(idx)
            sum_len += self.lengths[idx]
            if sum_len >= self.total_length:
                batches.append(batch)
                batch, sum_len = [], 0.0
        self.rng.shuffle(batches)
        return iter(batches)


class DistributedConcatLengthSampler(Sampler):
    """Distributed token-budget batching (``sampler.py:210-254``)."""

    def __init__(self, batch_size: int, max_length: float,
                 lengths: List[float], world_size: int, rank: int,
                 seed: int = 1234):
        if rank >= world_size or rank < 0:
            raise ValueError(f"invalid rank {rank}")
        self.lengths = lengths
        self.total_length = batch_size * max_length
        self.world_size, self.rank = world_size, rank
        self.epoch, self.seed = 0, seed

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self):
        idxs = list(range(len(self.lengths)))
        random.Random(self.epoch + self.seed).shuffle(idxs)
        batches, batch, sum_len = [], [], 0.0
        for idx in idxs:
            batch.append(idx)
            sum_len += self.lengths[idx]
            if sum_len >= self.total_length:
                batches.append(batch)
                batch, sum_len = [], 0.0
        num_samples = math.ceil(
            (len(batches) - self.world_size) / self.world_size)
        total = num_samples * self.world_size
        batches = batches[:total]
        batches = batches[self.rank * num_samples:
                          (self.rank + 1) * num_samples]
        random.shuffle(batches)
        return iter(batches)


def standard_sampler(n: int, batch_size: int, shuffle: bool,
                     distributed: bool = False,
                     world_size: Optional[int] = None,
                     rank: Optional[int] = None,
                     drop_last: bool = True,
                     seed: Optional[int] = None) -> Sampler:
    if distributed:
        assert world_size is not None and rank is not None
        return DistributedSampler(n, batch_size, world_size, rank,
                                  shuffle=shuffle, drop_last=drop_last,
                                  seed=seed or 0)
    if shuffle:
        return RandomSampler(n, batch_size, drop_last=drop_last, seed=seed)
    return SequentialSampler(n, batch_size, drop_last=drop_last)


def random_bucket_sampler(nbuckets: int, lengths: List[float],
                          batch_size: Optional[int] = None,
                          batch_length: Optional[float] = None,
                          drop_last: bool = True,
                          distributed: bool = False,
                          world_size: Optional[int] = None,
                          rank: Optional[int] = None) -> Sampler:
    if distributed:
        assert world_size is not None and rank is not None
        return DistributedRandomBucketSampler(
            nbuckets, lengths, world_size, rank, batch_size, batch_length,
            drop_last)
    return SingleRandomBucketSampler(nbuckets, lengths, batch_size,
                                     batch_length, drop_last)


def concat_length_sampler(batch_size: int, max_length: float,
                          lengths: List[float],
                          distributed: bool = False,
                          world_size: Optional[int] = None,
                          rank: Optional[int] = None) -> Sampler:
    if distributed:
        assert world_size is not None and rank is not None
        return DistributedConcatLengthSampler(batch_size, max_length,
                                              lengths, world_size, rank)
    return SingleConcatLengthSampler(batch_size, max_length, lengths)

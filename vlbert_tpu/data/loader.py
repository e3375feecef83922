"""Host data loader: per-host sharding, epoch-seeded shuffling, worker pool,
prefetch, and the multitask zip.

ref:
  * DistributedSampler (pretrain/data/samplers/distributed.py:10-66):
    rank-sharded, epoch-seeded shuffle, pad-to-divisible — here per-host
    sharding uses jax.process_index()/process_count();
  * dataloader factory (pretrain/data/build.py:43-105);
  * MultiTaskDataLoader (common/utils/multi_task_dataloader.py:17-54):
    master loader defines epoch length; aux loaders auto-restart.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class ShardedSampler:
    """Epoch-seeded shuffle, sharded across hosts, padded to divisibility
    (ref distributed.py:10-66)."""

    def __init__(self, n, shuffle=True, num_replicas=1, rank=0, seed=0):
        self.n = n
        self.shuffle = shuffle
        self.num_replicas = num_replicas
        self.rank = rank
        self.seed = seed
        self.epoch = 0
        self.num_samples = -(-n // num_replicas)
        self.total = self.num_samples * num_replicas

    def set_epoch(self, epoch):
        self.epoch = epoch

    def indices(self):
        if self.shuffle:
            g = np.random.default_rng(self.seed + self.epoch)
            idx = g.permutation(self.n)
        else:
            idx = np.arange(self.n)
        # pad to divisible (wrap around, ref :47-49); np.resize tiles, so
        # datasets smaller than a shard still pad fully
        if self.total > self.n:
            idx = np.resize(idx, self.total)
        return idx[self.rank::self.num_replicas]


class DataLoader:
    """Batched loader with a background prefetch thread.

    dataset: object with __len__ and __getitem__(i) -> dict of fixed-shape
    numpy arrays. collate: dict-list -> batch tuple (task-specific).
    """

    def __init__(self, dataset, batch_size, collate_fn, shuffle=True,
                 num_replicas=1, rank=0, seed=0, drop_last=True,
                 prefetch=2, num_threads=4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.sampler = ShardedSampler(len(dataset), shuffle, num_replicas,
                                      rank, seed)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_threads = num_threads

    def set_epoch(self, epoch):
        self.sampler.set_epoch(epoch)

    def __len__(self):
        n = self.sampler.num_samples
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)

    def _batches(self):
        idx = self.sampler.indices()
        if not self.drop_last and len(idx) % self.batch_size:
            # pad by wrapping so every batch is full (static shapes); the
            # reference's DistributedSampler pads to divisibility the same
            # way (ref distributed.py:47-49). np.resize tiles, covering
            # datasets smaller than one batch.
            n_full = -(-len(idx) // self.batch_size) * self.batch_size
            idx = np.resize(idx, n_full)
        nb = len(self)
        for b in range(nb):
            yield idx[b * self.batch_size:(b + 1) * self.batch_size]

    def __iter__(self):
        q = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def produce():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_threads) as pool:
                    for batch_idx in self._batches():
                        samples = list(pool.map(
                            self.dataset.__getitem__, batch_idx))
                        q.put(self.collate_fn(samples))
            except BaseException as e:  # surface worker errors
                q.put(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item


class MultiTaskLoader:
    """Zip of a master loader (defines epoch length) with aux loaders that
    restart on exhaustion (ref multi_task_dataloader.py:17-54). Batches are
    concatenated tuple-wise: (master..., aux0..., aux1...)."""

    def __init__(self, loaders):
        assert len(loaders) >= 1
        self.loaders = loaders
        self.cycles = [0] * len(loaders)

    def set_epoch(self, epoch):
        self.loaders[0].set_epoch(epoch)
        # aux loaders advance by their own cycle count

    def __len__(self):
        return len(self.loaders[0])

    def __iter__(self):
        iters = [iter(l) for l in self.loaders]
        for master in iters[0]:
            out = list(master)
            for i in range(1, len(self.loaders)):
                try:
                    aux = next(iters[i])
                except StopIteration:
                    self.cycles[i] += 1
                    if hasattr(self.loaders[i], "set_epoch"):
                        self.loaders[i].set_epoch(self.cycles[i])
                    iters[i] = iter(self.loaders[i])
                    aux = next(iters[i])
                out.extend(aux)
            yield tuple(out)


class GroupedBatchSampler:
    """Batches within aspect-ratio groups, preserving sampler order.

    ref: pretrain/data/samplers/grouped_batch_sampler.py:9-113 (from
    maskrcnn-benchmark), wired to TRAIN.ASPECT_GROUPING. Groups here are any
    integer labels (the reference uses horizontal/vertical = 0/1).
    """

    def __init__(self, indices, group_ids, batch_size, drop_uneven=False):
        self.indices = np.asarray(indices)
        self.group_ids = np.asarray(group_ids)
        self.batch_size = batch_size
        self.drop_uneven = drop_uneven

    def __iter__(self):
        order = {int(idx): pos for pos, idx in enumerate(self.indices)}
        clusters = {}
        for idx in self.indices:
            g = int(self.group_ids[int(idx)])
            clusters.setdefault(g, []).append(int(idx))
        batches = []
        for g, idxs in clusters.items():
            for i in range(0, len(idxs), self.batch_size):
                chunk = idxs[i:i + self.batch_size]
                if self.drop_uneven and len(chunk) < self.batch_size:
                    continue
                batches.append(chunk)
        # preserve sampler order: sort batches by first element's position
        batches.sort(key=lambda b: order[b[0]])
        return iter(batches)

    def __len__(self):
        return sum(1 for _ in iter(self))

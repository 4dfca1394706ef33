"""Threaded prefetching batch loader + per-host sharding.

Replaces torch's DataLoader/DistributedSampler
(/root/reference/BigVGAN/train_binaural_mel.py:571-583): worker threads pull
samples (numpy IO releases the GIL in scipy/np), batches are stacked and
handed to the device loop; multi-host sharding slices the index space by
``jax.process_index()`` exactly where DistributedSampler would.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Any, Callable, Dict, Iterator, List

import numpy as np


def default_collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray) or isinstance(
            vals[0], (int, float, np.number, np.bool_)
        ):
            out[k] = np.stack([np.asarray(v) for v in vals])
        else:
            out[k] = vals  # strings etc.
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        prefetch: int = 4,
        collate_fn: Callable = default_collate,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.collate_fn = collate_fn
        self.seed = seed
        self.epoch = 0
        self.num_shards = num_shards
        self.shard_index = shard_index

    def set_epoch(self, epoch: int):
        """DistributedSampler.set_epoch equivalent (reference :694-695)."""
        self.epoch = epoch

    def _indices(self) -> List[int]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idx)
        # per-host shard (DistributedSampler semantics: stride slicing)
        idx = idx[self.shard_index :: self.num_shards]
        if self.drop_last:
            idx = idx[: len(idx) - len(idx) % self.batch_size]
        return idx

    def __len__(self):
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        indices = self._indices()
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if not batches:
            return iter(())

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        job_q: "queue.Queue" = queue.Queue()
        for bi, b in enumerate(batches):
            job_q.put((bi, b))
        results: Dict[int, Any] = {}
        lock = threading.Lock()
        next_emit = [0]

        def worker():
            while True:
                try:
                    bi, batch_idx = job_q.get_nowait()
                except queue.Empty:
                    return
                samples = [self.dataset[i] for i in batch_idx]
                batch = self.collate_fn(samples)
                with lock:
                    results[bi] = batch
                    while next_emit[0] in results:
                        out_q.put(results.pop(next_emit[0]))
                        next_emit[0] += 1

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        for _ in range(len(batches)):
            yield out_q.get()

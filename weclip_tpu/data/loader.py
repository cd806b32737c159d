"""Background-threaded, shuffled, infinitely-repeating batch loader.

Replaces the reference's torch DataLoader(num_workers=10, prefetch_factor=4)
(scripts/dist_clip_voc.py:168-174) with a dependency-free prefetcher: worker
threads draw shuffled indices, run the numpy transform pipeline, and push
collated batches into a bounded queue while the TPU steps.

Batch order is deterministic: the feeder stamps every index batch with a
sequence number, workers carry it through, and the consumer reorders — so
``seed=`` implies a byte-identical batch stream regardless of thread count
or timing (matching torch DataLoader's order preservation).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List

import numpy as np


def collate(examples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k in examples[0]:
        v0 = examples[0][k]
        if isinstance(v0, str):
            out[k] = np.asarray([e[k] for e in examples])
        else:
            out[k] = np.stack([np.asarray(e[k]) for e in examples])
    return out


class PrefetchLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 1, num_threads: int = 2, prefetch: int = 4,
                 drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        if drop_last and len(dataset) < batch_size:
            raise ValueError(
                f"dataset ({len(dataset)} examples) smaller than one batch "
                f"({batch_size}) with drop_last=True — no batch would ever "
                f"be produced")
        self.rng = np.random.default_rng(seed)
        self.q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self.idx_q: "queue.Queue" = queue.Queue(maxsize=prefetch * 2)
        # consumer-side reorder buffer: seq -> batch.  Bounded by
        # num_threads + prefetch (workers block on q.put once full).
        self._reorder: Dict[int, Dict[str, np.ndarray]] = {}
        self._next_seq = 0
        self._stop = threading.Event()
        self._threads = [threading.Thread(target=self._worker, daemon=True)
                         for _ in range(num_threads)]
        self._feeder = threading.Thread(target=self._feed, daemon=True)
        self._feeder.start()
        for t in self._threads:
            t.start()

    def _feed(self):
        n = len(self.dataset)
        seq = 0
        while not self._stop.is_set():
            order = self.rng.permutation(n) if self.shuffle else np.arange(n)
            end = (n // self.batch_size) * self.batch_size if self.drop_last else n
            for s in range(0, end, self.batch_size):
                if self._stop.is_set():
                    return
                self.idx_q.put((seq, order[s:s + self.batch_size]))
                seq += 1

    def _worker(self):
        while not self._stop.is_set():
            try:
                seq, idxs = self.idx_q.get(timeout=0.5)
            except queue.Empty:
                continue
            batch = collate([self.dataset[int(i)] for i in idxs])
            while not self._stop.is_set():
                try:
                    self.q.put((seq, batch), timeout=0.5)
                    break
                except queue.Full:
                    continue

    def _get_ordered(self) -> Dict[str, np.ndarray]:
        # single consumer: no lock needed on the reorder buffer
        while self._next_seq not in self._reorder:
            seq, batch = self.q.get()
            self._reorder[seq] = batch
        batch = self._reorder.pop(self._next_seq)
        self._next_seq += 1
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while not self._stop.is_set():
            yield self._get_ordered()

    def __next__(self):
        return self._get_ordered()

    def close(self):
        self._stop.set()

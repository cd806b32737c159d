"""Background-threaded, shuffled, infinitely-repeating batch loader.

Replaces the reference's torch DataLoader(num_workers=10, prefetch_factor=4)
(scripts/dist_clip_voc.py:168-174) with a dependency-free prefetcher: worker
threads draw shuffled indices, run the numpy transform pipeline, and push
collated batches into a bounded queue while the TPU steps.

Determinism: the feeder stamps every index batch with a sequence number,
workers carry it through, and the consumer reorders — so batch ORDER is
byte-identical for a given ``seed``.  Augmentation randomness is also
timing-independent: datasets that expose ``get_example(idx, rng)`` (the
training datasets) receive a fresh per-item ``random.Random`` seeded by
(seed, seq, slot), so the augmented pixels do not depend on which thread
picks up which batch (a shared dataset RNG consumed concurrently would).

Robustness: the feeder admits at most ``num_threads + prefetch`` sequence
numbers beyond the last consumed batch, so the consumer-side reorder buffer
is bounded even when one worker is slow; a worker exception is forwarded to
the consumer and re-raised instead of hanging the stream.
"""

from __future__ import annotations

import queue
import random
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
    """``process_index``/``process_count``: per-host dataset sharding for
    multi-host slices (SURVEY §2.10; the reference's DistributedSampler
    role, scripts/dist_clip_voc.py:166).  Every host draws the SAME
    per-epoch permutation (same ``seed``) and takes the strided slice
    ``perm[:len//P*P][process_index::P]`` — shards are disjoint, equal
    length on every host, and their union is the permutation's first
    ``len//P*P`` elements, so the global stream is a deterministic
    function of ``seed`` alone (the ≤P-1 remainder examples of each epoch
    are dropped, like DistributedSampler(drop_last=True))."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 1, num_threads: int = 2, prefetch: int = 4,
                 drop_last: bool = True, process_index: int = 0,
                 process_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        if not 0 <= process_index < process_count:
            raise ValueError(
                f"process_index {process_index} outside [0, {process_count})")
        self.process_index = process_index
        self.process_count = process_count
        if drop_last and len(dataset) // process_count < batch_size:
            raise ValueError(
                f"dataset shard ({len(dataset)} examples / {process_count} "
                f"hosts) smaller than one batch ({batch_size}) with "
                f"drop_last=True — no batch would ever be produced")
        self._seed = seed
        self.rng = np.random.default_rng(seed)
        self._window = num_threads + prefetch
        self.q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self.idx_q: "queue.Queue" = queue.Queue(maxsize=self._window)
        # consumer-side reorder buffer: seq -> batch.  Bounded by _window:
        # the feeder never admits seq >= consumed + window (condition below).
        self._reorder: Dict[int, Dict[str, np.ndarray]] = {}
        self._next_seq = 0
        self._admit = threading.Condition()
        self._stop = threading.Event()
        self._threads = [threading.Thread(target=self._worker, daemon=True)
                         for _ in range(num_threads)]
        self._feeder = threading.Thread(target=self._feed, daemon=True)
        self._feeder.start()
        for t in self._threads:
            t.start()

    def _feed(self):
        n_total = len(self.dataset)
        seq = 0
        while not self._stop.is_set():
            order = (self.rng.permutation(n_total) if self.shuffle
                     else np.arange(n_total))
            if self.process_count > 1:
                per_host = n_total // self.process_count
                order = order[:per_host * self.process_count][
                    self.process_index::self.process_count]
            n = len(order)
            end = (n // self.batch_size) * self.batch_size if self.drop_last else n
            for s in range(0, end, self.batch_size):
                with self._admit:
                    while (seq >= self._next_seq + self._window
                           and not self._stop.is_set()):
                        self._admit.wait(timeout=0.5)
                if self._stop.is_set():
                    return
                self.idx_q.put((seq, order[s:s + self.batch_size]))
                seq += 1

    def _load_one(self, seq: int, slot: int, idx: int) -> Dict[str, np.ndarray]:
        get = getattr(self.dataset, "get_example", None)
        if get is not None:
            # per-item RNG: augmentations are a pure function of
            # (seed, stream position), independent of thread scheduling.
            # Injective integer mix (Random() rejects tuple seeds on 3.12+).
            item_seed = ((self._seed * (2 ** 64) + seq) * (2 ** 16)) + slot
            return get(idx, random.Random(item_seed))
        return self.dataset[idx]

    def _worker(self):
        while not self._stop.is_set():
            try:
                seq, idxs = self.idx_q.get(timeout=0.5)
            except queue.Empty:
                continue
            try:
                batch = collate([self._load_one(seq, j, int(i))
                                 for j, i in enumerate(idxs)])
            except Exception as exc:  # forward to the consumer (no hangs)
                batch = exc
            while not self._stop.is_set():
                try:
                    self.q.put((seq, batch), timeout=0.5)
                    break
                except queue.Full:
                    continue

    def _get_ordered(self) -> Dict[str, np.ndarray]:
        # single consumer: no lock needed on the reorder buffer
        while self._next_seq not in self._reorder:
            if self._stop.is_set():
                raise StopIteration
            try:
                seq, batch = self.q.get(timeout=0.5)
            except queue.Empty:
                continue
            if isinstance(batch, Exception):
                self.close()
                raise batch
            self._reorder[seq] = batch
        batch = self._reorder.pop(self._next_seq)
        self._next_seq += 1
        with self._admit:
            self._admit.notify_all()
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while not self._stop.is_set():
            yield self._get_ordered()

    def __next__(self):
        return self._get_ordered()

    def close(self):
        self._stop.set()
        with self._admit:
            self._admit.notify_all()

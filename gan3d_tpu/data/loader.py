"""Shuffled, drop-last, prefetching batch loader.

Replaces the reference's ``DataLoader(batch_size, shuffle=True,
num_workers=4, drop_last=True)`` + ``inf_train_gen`` infinite wrapper
(reference: trainer.py:84, 95-98). Batches are assembled by a thread pool
(npz decompression releases the GIL inside zlib) and prefetched ahead of the
training step so host IO overlaps TPU compute.

Yields float32 arrays of shape [B, D, H, W] in [-1, 1]; the trainer appends
the trailing channel axis (NDHWC) — the reference instead prepends one
(NCDHW) at trainer.py:300.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._stops: list = []  # stop events of live infinite() producers

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        n = len(idx)
        if self.drop_last:
            n = (n // self.batch_size) * self.batch_size
        return idx[:n]

    def __iter__(self) -> Iterator[np.ndarray]:
        """One pass over the data (epoch)."""
        idx = self._epoch_indices()
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i : i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            yield self.dataset.batch(chunk)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def infinite(self) -> Iterator[np.ndarray]:
        """Infinite shuffled batches with background prefetch.

        Equivalent of the reference's inf_train_gen (trainer.py:95-98), with
        an explicit prefetch queue instead of worker processes. The producer
        thread exits promptly once the consumer stops (generator .close(),
        GC, or Loader.close()): every blocking queue operation is bounded by
        a timeout + stop-flag check, so no thread or queue is leaked when a
        Trainer is constructed repeatedly in one process.
        """
        q: "queue.Queue[Optional[np.ndarray]]" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        self._stops = [s for s in self._stops if not s.is_set()]
        self._stops.append(stop)

        def _put(item) -> bool:
            """Bounded put: returns False if stopped while waiting."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            try:
                while not stop.is_set():
                    idx = self._epoch_indices()
                    batches = [
                        idx[i : i + self.batch_size]
                        for i in range(0, len(idx), self.batch_size)
                    ]
                    for fut in [pool.submit(self.dataset.batch, b) for b in batches]:
                        if not _put(fut.result()):
                            return
            finally:
                pool.shutdown(wait=False)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                try:
                    item = q.get(timeout=5.0)
                except queue.Empty:
                    if not t.is_alive():
                        raise RuntimeError("Loader producer thread died")
                    continue
                yield item
        finally:
            stop.set()

    def close(self) -> None:
        """Stop all producer threads started by infinite()."""
        for s in self._stops:
            s.set()
        self._stops.clear()


class DevicePrefetcher:
    """Double-buffered host->device upload of training batches.

    On the axon tunnel, a 33 MB f32 batch pair costs ~1.2 s to land on the
    device — longer than the 64^3 flagship's whole 0.85 s train step. This
    worker thread stacks ``iterD`` batches, optionally casts them to the
    wire dtype, and issues ``put_fn`` (device_put / put_global_batch) one
    step ahead, so the upload overlaps the previous step's compute.

    ``get()`` returns ``(device_batch, last_host_batch_f32)`` — the host
    copy of the final sub-batch is kept for in-loop slice FID logging.

    Shutdown follows the Loader.infinite contract: every blocking queue op
    is bounded by a timeout + stop-flag check; ``close()`` joins the thread.
    """

    def __init__(self, gen: Iterator[np.ndarray], iter_d: int, put_fn,
                 wire_dtype=None, depth: int = 2):
        self._gen = gen
        self._iter_d = iter_d
        self._put = put_fn
        self._wire = wire_dtype
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._err: Optional[BaseException] = None
        self._t = threading.Thread(target=self._producer, daemon=True)
        self._t.start()

    def _producer(self) -> None:
        try:
            while not self._stop.is_set():
                reals = np.stack([next(self._gen)
                                  for _ in range(self._iter_d)])[..., None]
                host_last = reals[-1]
                wire = reals if self._wire is None \
                    else reals.astype(self._wire)
                item = (self._put(wire), host_last)
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # noqa: BLE001 — surfaced in get()
            self._err = e

    def get(self):
        while True:
            try:
                return self._q.get(timeout=5.0)
            except queue.Empty:
                if self._err is not None:
                    raise RuntimeError("DevicePrefetcher producer failed") \
                        from self._err
                if not self._t.is_alive():
                    raise RuntimeError("DevicePrefetcher thread died")

    def close(self) -> None:
        self._stop.set()
        self._t.join(timeout=2.0)

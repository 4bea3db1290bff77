"""Host-side input pipeline: threaded batch assembly + device prefetch.

Replaces the reference's 6-worker ``BlobFetcher`` process pool + pinned
memory (`dataloaders/dataloader.py:392-476`) with the TPU idiom: a thread
pool assembles fixed-shape numpy batches ahead of the step loop, and a
double-buffered ``jax.device_put`` keeps the next batch in flight while the
current step runs (fixed shapes — no recompilation).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


class BatchPrefetcher:
    """Wrap a get_batch callable with background assembly + device transfer.

    get_batch() -> (host_batch, *aux).  The device transfer (optionally
    sharded via `place`) happens on the producer thread so the consumer
    overlaps host IO, H2D, and compute.
    """

    def __init__(self, get_batch: Callable, depth: int = 2,
                 place: Optional[Callable] = None):
        self.get_batch = get_batch
        self.place = place or (lambda tree: jax.tree_util.tree_map(
            jax.numpy.asarray, tree))
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._exc = None
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _worker(self):
        try:
            while not self._stop.is_set():
                item = self.get_batch()
                batch, aux = item[0], item[1:]
                dev = self.place(batch)
                # block until there's room (bounded prefetch depth)
                while not self._stop.is_set():
                    try:
                        self.q.put((dev, aux), timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except Exception as e:    # surface worker failures to the consumer
            self._exc = e
            self.q.put(None)

    def next(self):
        item = self.q.get()
        if item is None:
            raise RuntimeError("prefetch worker failed") from self._exc
        return item

    def stop(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass

    def __iter__(self) -> Iterator:
        while True:
            yield self.next()

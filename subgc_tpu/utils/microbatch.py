"""Cross-client request coalescing for the serving path.

The jitted inference program has a static batch dimension, so each device
dispatch costs the same whether 1 or ``max_batch`` images ride it.  The
reference never serves online (its `eval_utils.py` only walks offline
splits); for a production TPU endpoint the win is coalescing: concurrent
single-image HTTP requests should share one dispatch instead of serializing
``max_batch``-padded dispatches behind a device lock.

Leader-election design (no background thread):

* callers enqueue their items and wait on a shared condition variable
* the first idle waiter elects itself leader, waits up to ``max_wait_ms``
  for the queue to fill (returning immediately once ``max_batch`` items are
  queued), then runs ``run_batch`` on up to ``max_batch`` items *outside*
  the lock and distributes results
* everyone whose item rode that dispatch wakes up with a result; anyone
  left re-runs the election

Per-item results must be independent of batch composition for this to be
transparent — true here because inference is vmapped per image and padding
slots are discarded.
"""
from __future__ import annotations

import threading
import time
from typing import Callable, List, Sequence

_UNSET = object()


class MicroBatcher:
    """Coalesce concurrent ``submit`` calls into ``run_batch`` dispatches.

    run_batch: items (1..max_batch of them) -> list of per-item results,
    same length/order.  Exceptions propagate to every caller in the batch.
    """

    def __init__(self, run_batch: Callable[[List], List], max_batch: int,
                 max_wait_ms: float = 3.0):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self._run = run_batch
        self._max = max_batch
        self._wait_s = max_wait_ms / 1000.0
        self._cv = threading.Condition()
        self._queue: List[list] = []     # [item, result, error] cells
        self._busy = False
        self.dispatch_count = 0          # observability (tests/metrics)

    def submit(self, item):
        return self.submit_many([item])[0]

    def submit_many(self, items: Sequence):
        """Enqueue all items at once (they coalesce with other callers'),
        block until every one has a result."""
        cells = [[it, _UNSET, None] for it in items]
        cv = self._cv
        with cv:
            self._queue.extend(cells)
            cv.notify_all()
            while any(c[1] is _UNSET and c[2] is None for c in cells):
                if self._busy or not self._queue:
                    cv.wait(0.05)
                    continue
                # leader: give stragglers max_wait_ms to fill the batch
                deadline = time.monotonic() + self._wait_s
                while (not self._busy
                       and 0 < len(self._queue) < self._max):
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    cv.wait(remaining)
                # re-check under the lock after waiting: another leader may
                # have started dispatching or drained the queue (possibly
                # resolving our cells — the outer while notices)
                if self._busy or not self._queue:
                    continue
                batch = self._queue[:self._max]
                del self._queue[:len(batch)]
                self._busy = True
                self.dispatch_count += 1
                cv.release()
                results, err = None, None
                try:
                    results = self._run([c[0] for c in batch])
                    if len(results) != len(batch):
                        raise RuntimeError(
                            f"run_batch returned {len(results)} results "
                            f"for {len(batch)} items")
                except Exception as e:
                    err, results = e, None
                finally:
                    cv.acquire()
                    self._busy = False
                    for i, cell in enumerate(batch):
                        if results is not None:
                            cell[1] = results[i]
                        else:
                            cell[2] = err if err is not None else \
                                RuntimeError("batch aborted")
                    cv.notify_all()
        for c in cells:
            if c[2] is not None:
                raise c[2]
        return [c[1] for c in cells]

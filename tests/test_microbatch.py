"""MicroBatcher: coalescing, correctness under concurrency, errors."""
import threading

import pytest

from subgc_tpu.utils.microbatch import MicroBatcher


def test_single_caller_full_batch_no_wait():
    calls = []
    mb = MicroBatcher(lambda xs: [x * 2 for x in (calls.append(list(xs)) or xs)],
                      max_batch=4, max_wait_ms=10_000.0)
    # a full batch must dispatch immediately, not wait out max_wait_ms
    assert mb.submit_many([1, 2, 3, 4]) == [2, 4, 6, 8]
    assert calls == [[1, 2, 3, 4]]
    assert mb.dispatch_count == 1


def test_underfull_dispatches_after_wait():
    mb = MicroBatcher(lambda xs: [x + 1 for x in xs], max_batch=8,
                      max_wait_ms=5.0)
    assert mb.submit(41) == 42
    assert mb.dispatch_count == 1


def test_concurrent_callers_coalesce():
    mb = MicroBatcher(lambda xs: [x * 10 for x in xs], max_batch=8,
                      max_wait_ms=200.0)
    n = 16
    barrier = threading.Barrier(n)
    results = [None] * n
    errors = []

    def worker(i):
        try:
            barrier.wait()
            results[i] = mb.submit(i)
        except Exception as e:       # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert results == [i * 10 for i in range(n)]
    # 16 items at max_batch 8 with a generous fill window: fewer dispatches
    # than callers proves coalescing (exactly 2 when timing cooperates;
    # loose bound tolerates single-core scheduling jitter)
    assert mb.dispatch_count <= 8


def test_oversubscribed_queue():
    """More queued items than max_batch: everyone still gets the right
    result via repeated leader elections."""
    mb = MicroBatcher(lambda xs: [x * 3 for x in xs], max_batch=2,
                      max_wait_ms=1.0)
    assert mb.submit_many(list(range(7))) == [i * 3 for i in range(7)]
    assert mb.dispatch_count == 4


def test_error_propagates_to_all_callers():
    def boom(xs):
        raise ValueError("kaput")
    mb = MicroBatcher(boom, max_batch=4, max_wait_ms=1.0)
    with pytest.raises(ValueError, match="kaput"):
        mb.submit_many([1, 2])
    # batcher stays usable after a failed dispatch
    mb._run = lambda xs: xs
    assert mb.submit(5) == 5


def test_length_mismatch_detected():
    mb = MicroBatcher(lambda xs: xs[:-1] if len(xs) > 1 else xs,
                      max_batch=4, max_wait_ms=1.0)
    with pytest.raises(RuntimeError, match="returned 1 results for 2"):
        mb.submit_many([1, 2])

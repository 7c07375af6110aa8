"""utils/prefetch.py — the shared one-ahead background iterator under the
three pipelined loops. Order, laziness, exception propagation, and worker
cleanup are the contract."""
import threading
import time

import pytest

from frtm_tpu.utils.prefetch import prefetch_iter


def test_order_and_disabled_mode():
    assert list(prefetch_iter(range(7))) == list(range(7))
    assert list(prefetch_iter(range(7), enabled=False)) == list(range(7))
    assert list(prefetch_iter([], enabled=True)) == []


def test_runs_one_ahead_on_worker_thread():
    main = threading.get_ident()
    seen_threads = []
    produced = []

    def gen():
        for i in range(4):
            seen_threads.append(threading.get_ident())
            produced.append(i)
            yield i

    it = prefetch_iter(gen())
    first = next(it)
    assert first == 0
    # one-ahead: by the time item 0 is delivered, item 1 is in flight or done
    time.sleep(0.1)
    assert produced[:2] == [0, 1]
    assert all(t != main for t in seen_threads)
    assert list(it) == [1, 2, 3]


def test_producer_exception_propagates():
    def gen():
        yield 1
        raise RuntimeError("decode failed")

    it = prefetch_iter(gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_consumer_break_joins_worker():
    """Breaking out (the consumer-exception path) must close the generator
    and join the in-flight prefetch — no leaked worker thread."""
    state = {"alive": 0}

    def gen():
        state["alive"] = threading.active_count()
        for i in range(100):
            yield i

    before = threading.active_count()
    for x in prefetch_iter(gen()):
        if x == 2:
            break
    # generator close() ran the pool's __exit__; give the executor a beat
    for _ in range(50):
        if threading.active_count() <= before:
            break
        time.sleep(0.05)
    assert threading.active_count() <= before

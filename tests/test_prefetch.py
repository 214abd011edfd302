"""Host-side batch prefetcher (utils/prefetch.py) -- the Trainer's overlap
between augmentation and device steps (trainer/train.py:304-308)."""
import itertools
import threading
import time

import pytest

from musicnlp_tpu.utils.prefetch import prefetch


def test_order_and_completeness():
    assert list(prefetch(iter(range(100)))) == list(range(100))
    assert list(prefetch(iter([]))) == []


def test_bounded_readahead():
    produced = []

    def gen():
        for i in range(50):
            produced.append(i)
            yield i

    it = prefetch(gen(), size=2)
    first = next(it)
    time.sleep(0.3)                       # let the worker run ahead
    # queue(2) + one item in flight + the one consumed
    assert first == 0 and len(produced) <= 4
    assert list(it) == list(range(1, 50))
    assert len(produced) == 50


def test_exception_propagates_after_prefix():
    def gen():
        yield 1
        yield 2
        raise ValueError('boom in producer')

    it = prefetch(gen())
    got = []
    with pytest.raises(ValueError, match='boom in producer'):
        for x in it:
            got.append(x)
    assert got == [1, 2]


def test_abandoned_consumer_stops_worker():
    # an infinite producer must not leave a thread parked on q.put forever
    # once the consumer closes the generator (exception mid-epoch, break)
    n0 = threading.active_count()
    it = prefetch(itertools.count(), size=2)
    assert [next(it) for _ in range(3)] == [0, 1, 2]
    it.close()                            # GeneratorExit -> stop event
    deadline = time.time() + 5.0
    while threading.active_count() > n0 and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n0

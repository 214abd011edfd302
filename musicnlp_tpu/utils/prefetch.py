"""Background-thread batch prefetching.

The TPU equivalent of the reference's `dataloader_num_workers=4` (reference
trainer/train.py:477,575): host-side augmentation (numpy gathers) overlaps
device steps via a small bounded queue.  One thread suffices -- the id-space
augmentation chain is ~100x cheaper than the reference's string pipeline.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

__all__ = ['prefetch']

_SENTINEL = object()


def prefetch(it: Iterator, size: int = 2) -> Iterator:
    q: queue.Queue = queue.Queue(maxsize=size)
    err = []

    def worker():
        try:
            for x in it:
                q.put(x)
        except BaseException as e:           # surface in consumer thread
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        x = q.get()
        if x is _SENTINEL:
            break
        yield x
    if err:
        raise err[0]

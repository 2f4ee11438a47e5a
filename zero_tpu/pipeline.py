"""Host->device feed: background prefetching over the Dataset batcher.

Replaces the reference's multiprocessing EnQueuer (utils/queuer.py:15-127,
whose README flags "Problems Exist") with a bounded-queue daemon thread:
batch construction is numpy-light, so threads avoid the fork/pickle races
while still overlapping host batching with device compute. A passthrough
mode mirrors ``worker_processes_num == 0`` (utils/queuer.py:58-66).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

_DONE = object()


class Prefetcher:
    """Iterate a generator on a daemon thread through a bounded queue."""

    def __init__(self, gen_fn: Callable[[], Iterator], maxsize: int = 100,
                 num_threads: int = 1):
        self._gen_fn = gen_fn
        self._maxsize = maxsize
        self._passthrough = num_threads <= 0
        self._queue: Optional[queue.Queue] = None
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def _worker(self) -> None:
        try:
            for item in self._gen_fn():
                self._queue.put(item)
        except BaseException as e:  # surface errors on the consumer side
            self._error = e
        finally:
            self._queue.put(_DONE)

    def __iter__(self):
        if self._passthrough:
            yield from self._gen_fn()
            return
        self._queue = queue.Queue(maxsize=self._maxsize)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
        while True:
            item = self._queue.get()
            if item is _DONE:
                break
            yield item
        if self._error is not None:
            raise self._error

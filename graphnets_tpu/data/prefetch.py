"""Asynchronous host-side batch prefetching.

The TPU should never wait on the host: batch construction (COO building,
padding, sampling — the native C++ runtime's job) runs in a background
thread while the device executes the previous step, with a bounded queue
for backpressure.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import jax

__all__ = ["prefetch", "PrefetchIterator"]


class PrefetchIterator:
    """Wraps an iterator; produces items from a background thread and
    optionally places them on device ahead of use."""

    _DONE = object()

    def __init__(self, it: Iterator[Any], buffer_size: int = 2,
                 device_put: bool = True):
        self._q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
        self._device_put = device_put
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._worker, args=(it,), daemon=True)
        self._thread.start()

    def _worker(self, it):
        try:
            for item in it:
                if self._device_put:
                    item = jax.device_put(item)
                self._q.put(item)
        except BaseException as e:  # surface in consumer
            self._err = e
        finally:
            self._q.put(self._DONE)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(it: Iterator[Any], buffer_size: int = 2,
             device_put: bool = True) -> PrefetchIterator:
    """``for batch in prefetch(batches): ...`` — overlap host batch
    construction with device compute."""
    return PrefetchIterator(it, buffer_size, device_put)

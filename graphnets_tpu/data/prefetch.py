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

__all__ = ["prefetch", "PrefetchIterator", "PrefetchPool"]


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


class PrefetchPool:
    """Multi-worker prefetcher: ``factory(worker_id)`` builds each worker's
    batch iterator (e.g. a :class:`..data.large_graph.NeighborSampler` with
    a worker-specific seed — samplers are stateful, so each worker owns its
    own).  Workers run concurrently and push into one bounded queue;
    iteration ends when every worker's iterator is exhausted.

    Use when one producer thread cannot keep the device fed
    (round-3 finding: the OGB pipeline was sampler-bound) — with
    ``num_workers`` samplers the host side scales to the core count.
    """

    _DONE = object()

    def __init__(self, factory: Callable[[int], Iterator[Any]],
                 num_workers: int = 2, buffer_size: int = 4,
                 device_put: bool = True):
        self._q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
        self._device_put = device_put
        self._err: Optional[BaseException] = None
        self._threads = [
            threading.Thread(target=self._worker, args=(factory, i),
                             daemon=True)
            for i in range(num_workers)]
        for t in self._threads:
            t.start()

    def _worker(self, factory, wid):
        try:
            for item in factory(wid):
                if self._device_put:
                    item = jax.device_put(item)
                self._q.put(item)
        except BaseException as e:
            self._err = e
        finally:
            self._q.put(self._DONE)

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            item = self._q.get()
            if item is self._DONE:
                self._n_done = getattr(self, "_n_done", 0) + 1
                if self._n_done == len(self._threads):
                    if self._err is not None:
                        raise self._err
                    raise StopIteration
                continue
            return item

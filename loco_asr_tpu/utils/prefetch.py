"""Background prefetch for host-side input pipelines.

The device should never wait on audio decode / tokenization: wrap any
batch iterator so N batches are prepared ahead on a worker thread while
the accelerator runs the current step (the framework's grain/tf.data-free
prefetch lane, SURVEY §7 item 4).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class PrefetchIterator(Iterator[T]):
    """Iterate ``source`` on a daemon thread, buffering up to ``depth``
    items.  Exceptions in the producer re-raise in the consumer."""

    def __init__(self, source: Iterable[T], depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._err = None

        def run():
            try:
                for item in source:
                    self._q.put(item)
            except BaseException as e:  # noqa: BLE001 — reraised in consumer
                self._err = e
            finally:
                self._q.put(_SENTINEL)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def __iter__(self) -> "PrefetchIterator[T]":
        return self

    def __next__(self) -> T:
        item = self._q.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(source: Iterable[T], depth: int = 2) -> PrefetchIterator[T]:
    return PrefetchIterator(source, depth)

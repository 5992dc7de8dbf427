"""Host-side batch prefetching.

The reference keeps the GPU fed with DataLoader worker processes; on this
side the equivalent is a daemon thread that runs collation (tokenization +
image preprocessing) ahead of the training step, so host work overlaps the
device step instead of serializing with it. One thread suffices: jax
dispatch is async, so the main thread spends most of its time NOT blocked
on the device.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_END = object()


def prefetch(iterable: Iterable[T], buffer_size: int = 2) -> Iterator[T]:
    """Iterate ``iterable`` on a daemon thread, keeping up to ``buffer_size``
    items ready. Exceptions in the producer re-raise at the consumer."""
    if buffer_size < 1:
        yield from iterable
        return

    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)

    def producer() -> None:
        try:
            for item in iterable:
                q.put(item)
        except BaseException as exc:  # noqa: BLE001 — forwarded to the consumer
            q.put(exc)
            return
        q.put(_END)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item

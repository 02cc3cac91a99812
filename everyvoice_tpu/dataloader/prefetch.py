"""Background batch prefetching.

Host-side batch assembly (disk reads + padding) takes orders of magnitude
longer than a TPU train step, so trainers wrap their batch iterators in
`prefetch`, which assembles upcoming batches on a daemon thread while the
device computes — the role of the reference's DataLoader worker processes
(train_data_workers), implemented with a thread + bounded queue.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

_SENTINEL = object()


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Yield from `iterator`, assembling up to `size` items ahead on a
    background thread. Exceptions on the worker re-raise at the consumer."""
    q: queue.Queue = queue.Queue(maxsize=size)

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # propagate to the consumer
            q.put(e)
        finally:
            q.put(_SENTINEL)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, BaseException):
            raise item
        yield item

"""Double-buffered device prefetch for the input pipeline.

Standard TPU input practice the reference lacks (its DataLoader hands
batches to a synchronous training loop): while step N computes on device,
batch N+1's host work (assembly, wire compaction) and host->device
transfer are already in flight on a background thread, so the device
never idles on the link. `jax.device_put` is asynchronous, so issuing the
puts ahead is all the overlap needs; the bounded queue caps device-memory
use at `depth` in-flight batches.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Tuple

_END = object()


def device_prefetch(host_batches: Iterable[dict],
                    put: Callable[[dict], object], *,
                    depth: int = 2) -> Iterator[Tuple[object, dict]]:
    """Yields (device_batch, host_batch) pairs, staying `depth` ahead.

    `put` maps a host batch to its device form (e.g. the host-key split +
    `mesh.shard_batch`); it runs on the prefetch thread. The original host
    batch is passed through for host-side consumers (labels, example_mask).
    Exceptions from the iterator or `put` re-raise at the consuming site.
    """
    q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
    failure = []

    def worker():
        try:
            for hb in host_batches:
                q.put((put(hb), hb))
        except BaseException as e:  # surfaced to the consumer below
            failure.append(e)
        finally:
            q.put(_END)

    threading.Thread(target=worker, daemon=True,
                     name="device-prefetch").start()
    while True:
        item = q.get()
        if item is _END:
            if failure:
                raise failure[0]
            return
        yield item

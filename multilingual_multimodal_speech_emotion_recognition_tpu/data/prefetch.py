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

    If the consumer abandons the iterator early (train-step exception,
    generator .close()), the worker notices via `stop` on its next bounded
    put and exits instead of blocking forever with device batches pinned
    in the queue.
    """
    q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
    failure = []
    stop = threading.Event()

    def try_put(item) -> bool:
        # Bounded wait so the worker re-checks `stop` even when the
        # consumer has gone away and will never drain the queue.
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for hb in host_batches:
                if stop.is_set() or not try_put((put(hb), hb)):
                    return
        except BaseException as e:  # surfaced to the consumer below
            failure.append(e)
        finally:
            try_put(_END)

    threading.Thread(target=worker, daemon=True,
                     name="device-prefetch").start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if failure:
                    raise failure[0]
                return
            yield item
    finally:
        stop.set()
        # Drain anything the worker had queued so its device buffers are
        # released promptly rather than held until interpreter exit.
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break

"""Device-prefetch iterator (data/prefetch.py)."""

import time

import numpy as np
import pytest

from multilingual_multimodal_speech_emotion_recognition_tpu.data.prefetch import (
    device_prefetch)


def test_order_and_pairing():
    batches = [{"i": np.array([k])} for k in range(7)]
    out = list(device_prefetch(iter(batches), lambda b: b["i"] * 2, depth=3))
    assert [int(h["i"][0]) for _, h in out] == list(range(7))
    assert [int(d[0]) for d, _ in out] == [2 * k for k in range(7)]


def test_overlap_happens_ahead():
    """The producer must run ahead of the consumer up to `depth`."""
    produced = []

    def gen():
        for k in range(5):
            produced.append(k)
            yield {"k": k}

    it = device_prefetch(gen(), lambda b: b, depth=2)
    first = next(it)
    time.sleep(0.05)  # give the worker time to fill the queue
    # with depth=2 the worker is at least 2 items past the one consumed
    assert len(produced) >= 3
    assert first[1]["k"] == 0
    assert [h["k"] for _, h in it] == [1, 2, 3, 4]


def test_exception_propagates():
    def gen():
        yield {"k": 0}
        raise RuntimeError("decode failed")

    it = device_prefetch(gen(), lambda b: b)
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(it)


def test_put_exception_propagates():
    def put(b):
        if b["k"] == 1:
            raise ValueError("bad batch")
        return b

    it = device_prefetch(iter([{"k": 0}, {"k": 1}, {"k": 2}]), put)
    with pytest.raises(ValueError, match="bad batch"):
        list(it)


def test_abandoned_consumer_stops_worker():
    """Closing the iterator early must unblock and stop the worker thread
    (it used to block forever on q.put, pinning device batches)."""
    import threading

    produced = []

    def gen():
        for k in range(1000):
            produced.append(k)
            yield {"k": k}

    it = device_prefetch(gen(), lambda b: b, depth=1)
    next(it)
    it.close()  # consumer abandons mid-stream
    deadline = time.time() + 5.0
    while time.time() < deadline:
        alive = [t for t in threading.enumerate()
                 if t.name == "device-prefetch" and t.is_alive()]
        if not alive:
            break
        time.sleep(0.05)
    assert not alive, "prefetch worker leaked after consumer close()"
    assert len(produced) < 1000  # worker stopped early, didn't drain source

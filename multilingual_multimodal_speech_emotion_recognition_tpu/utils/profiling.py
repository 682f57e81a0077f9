"""Profiling and step-timing harnesses.

TPU equivalents of the reference's wall-clock benchmarking
(/root/reference/src/evaluation/inference_metrics.py:42-336) and per-stage
timing (integration/data_flow_architecture.py:81-90), per SURVEY.md §5.1:
jax.profiler traces (TensorBoard/Perfetto-readable), a sync-bracketed step
timer that forces a host transfer (on relayed backends block_until_ready
returns before remote execution finishes), and a throughput meter.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False):
    """jax.profiler trace context; view with TensorBoard or Perfetto."""
    import jax
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Force completion by fetching one leaf to host (relay-safe)."""
    import jax
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(jax.device_get(leaves[0]))


@dataclass
class StepTimer:
    """Accumulates per-step wall times; reports percentiles like the
    reference's latency stats (inference_metrics.py:134-171)."""
    times: List[float] = field(default_factory=list)
    _t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def stats(self) -> Dict[str, float]:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {"mean_ms": float(t.mean() * 1e3),
                "std_ms": float(t.std() * 1e3),
                "p50_ms": float(np.percentile(t, 50) * 1e3),
                "p95_ms": float(np.percentile(t, 95) * 1e3),
                "p99_ms": float(np.percentile(t, 99) * 1e3),
                "steps": len(self.times)}


@dataclass
class ThroughputMeter:
    """Utterances/sec (/chip) tracking — the BASELINE.json headline metric."""
    items: int = 0
    seconds: float = 0.0

    def add(self, n_items: int, dt: float) -> None:
        self.items += n_items
        self.seconds += dt

    def per_sec(self, n_chips: int = 1) -> float:
        return self.items / self.seconds / n_chips if self.seconds else 0.0


def device_memory_stats() -> Dict[str, int]:
    """Device memory counters where the backend exposes them (the TPU
    analogue of the reference's torch.cuda.memory_allocated probes)."""
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return {k: int(v) for k, v in stats.items()
                if isinstance(v, (int, np.integer))}
    except Exception:
        return {}

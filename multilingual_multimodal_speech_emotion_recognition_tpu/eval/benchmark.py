"""Inference benchmarking: latency percentiles, throughput, memory,
parameter counts, batch-size scaling efficiency.

Parity with /root/reference/src/evaluation/inference_metrics.py:42-336
(warmup + timed runs over batch sizes [1,4,8,16]; latency mean/std/p50/p95/
p99; samples-, words- and audio-seconds-per-second; psutil CPU/RSS; param
counts/model size; scaling-efficiency analysis), adapted to JAX: timings
bracket a forced host sync (on relayed TPU backends block_until_ready can
return before remote execution finishes), and device memory comes from
jax.local_devices()[0].memory_stats() where the backend exposes it.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Sequence

import numpy as np


def count_params(params) -> Dict[str, int]:
    import jax
    leaves = jax.tree.leaves(params)
    total = int(sum(np.prod(l.shape) for l in leaves))
    bytes_total = int(sum(np.prod(l.shape) * l.dtype.itemsize for l in leaves))
    return {"total_params": total, "model_size_mb": bytes_total / 1e6}


def _sync(x):
    return np.asarray(x)


def benchmark_fn(fn: Callable[[int], object], *, batch_sizes: Sequence[int] = (1, 4, 8, 16),
                 warmup: int = 3, runs: int = 10,
                 audio_seconds_per_sample: float = 0.0,
                 words_per_sample: float = 0.0) -> Dict:
    """fn(batch_size) -> output pytree/array; called with each batch size.
    Returns the inference_metrics.py-style report dict."""
    try:
        import psutil
        proc = psutil.Process()
    except ImportError:
        proc = None

    results = {}
    for bs in batch_sizes:
        for _ in range(warmup):
            _sync(fn(bs))
        latencies = []
        cpu_before = proc.cpu_percent(interval=None) if proc else 0.0
        for _ in range(runs):
            t0 = time.perf_counter()
            _sync(fn(bs))
            latencies.append(time.perf_counter() - t0)
        lat = np.asarray(latencies)
        entry = {
            "batch_size": bs,
            "latency_mean_ms": float(lat.mean() * 1e3),
            "latency_std_ms": float(lat.std() * 1e3),
            "latency_p50_ms": float(np.percentile(lat, 50) * 1e3),
            "latency_p95_ms": float(np.percentile(lat, 95) * 1e3),
            "latency_p99_ms": float(np.percentile(lat, 99) * 1e3),
            "samples_per_sec": float(bs / lat.mean()),
        }
        if audio_seconds_per_sample:
            entry["audio_sec_per_sec"] = entry["samples_per_sec"] * audio_seconds_per_sample
        if words_per_sample:
            entry["words_per_sec"] = entry["samples_per_sec"] * words_per_sample
        if proc:
            entry["cpu_percent"] = proc.cpu_percent(interval=None)
            entry["rss_mb"] = proc.memory_info().rss / 1e6
        entry.update(_device_memory())
        results[bs] = entry

    return {"per_batch_size": results,
            "scaling": scaling_efficiency(results)}


def _device_memory() -> Dict:
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            return {"device_bytes_in_use": int(stats.get("bytes_in_use", 0)),
                    "device_peak_bytes": int(stats.get("peak_bytes_in_use", 0))}
    except Exception:
        pass
    return {}


def scaling_efficiency(per_batch: Dict[int, Dict]) -> Dict:
    """Throughput scaling vs the smallest batch (inference_metrics.py
    scaling analysis): efficiency(b) = (thr_b / thr_min) / (b / b_min)."""
    if not per_batch:
        return {}
    sizes = sorted(per_batch)
    b0 = sizes[0]
    thr0 = per_batch[b0]["samples_per_sec"]
    eff = {}
    for b in sizes:
        thr = per_batch[b]["samples_per_sec"]
        eff[b] = (thr / thr0) / (b / b0) if thr0 > 0 else 0.0
    best = max(sizes, key=lambda b: per_batch[b]["samples_per_sec"])
    return {"efficiency_vs_smallest": eff, "best_batch_size": best,
            "best_samples_per_sec": per_batch[best]["samples_per_sec"]}


def benchmark_report(result: Dict, param_info: Optional[Dict] = None) -> str:
    lines = ["Inference Benchmark", "==================="]
    if param_info:
        lines.append(f"Parameters: {param_info['total_params']:,} "
                     f"({param_info['model_size_mb']:.1f} MB)")
    lines.append(f"{'batch':>6} {'mean ms':>9} {'p50':>8} {'p95':>8} "
                 f"{'p99':>8} {'samp/s':>9}")
    for bs, e in sorted(result["per_batch_size"].items()):
        lines.append(f"{bs:>6} {e['latency_mean_ms']:9.2f} "
                     f"{e['latency_p50_ms']:8.2f} {e['latency_p95_ms']:8.2f} "
                     f"{e['latency_p99_ms']:8.2f} {e['samples_per_sec']:9.1f}")
    sc = result.get("scaling", {})
    if sc:
        lines.append(f"best batch {sc['best_batch_size']} @ "
                     f"{sc['best_samples_per_sec']:.1f} samples/s")
    return "\n".join(lines)

"""Process-level runtime knobs shared by every CLI entry point.

The reference repeats its device-selection boilerplate in each script
(/root/reference/src/train.py:41-46, src/eval.py:81-87 and five more
copies); the TPU-native equivalent is the one place that configures the
JAX runtime: platform override and the persistent compilation cache.

The cache matters disproportionately here: every new (shape, program)
pair costs one XLA compile, and on relayed TPU backends a single compile
of the flagship forward runs 5-300 s. With the persistent cache, the
second process that asks for the same program loads it in well under a
second — bucketed serving, repeated evals, and restarted training all hit
the same few programs.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

_DEFAULT_CACHE = "~/.cache/ser_tpu/xla_cache"


def enable_compilation_cache(cache_dir: Optional[str] = None,
                             *, min_compile_secs: float = 0.0) -> str:
    """Turn on JAX's persistent compilation cache.

    Resolution order: explicit arg > $SER_TPU_CACHE_DIR > ~/.cache/ser_tpu.
    Set $SER_TPU_CACHE_DIR=off (or pass "off") to disable. Safe to call
    more than once; returns the directory in use ("" when disabled).
    """
    import jax

    cache_dir = cache_dir or os.environ.get("SER_TPU_CACHE_DIR", _DEFAULT_CACHE)
    if not cache_dir or cache_dir.lower() in ("off", "0", "none"):
        return ""
    path = Path(cache_dir).expanduser()
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_enable_compilation_cache", True)
    # cache even quick compiles: on the relay every round trip hurts
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return str(path)


def configure(platform: Optional[str] = None,
              cache_dir: Optional[str] = None,
              num_cpu_devices: Optional[int] = None,
              prng_impl: Optional[str] = None) -> None:
    """One-call runtime setup for CLI mains. Must run before any JAX
    computation (platform flips are ignored after backend init).

    prng_impl: "rbg" routes jax.random through XLA's RngBitGenerator —
    threefry mask generation is VPU-expensive on TPU, and the training
    forward (backbone dropout active, like the reference's train()-mode
    modules) measured 121 -> 102 ms @ B=128/4 s with rbg. Random STREAMS
    differ from threefry (dropout masks, augmentation draws — not model
    math), and rbg bit-stability is not guaranteed across XLA versions,
    so bit-reproducible runs should pass "threefry2x32"."""
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    if num_cpu_devices:
        jax.config.update("jax_num_cpu_devices", int(num_cpu_devices))
    if prng_impl:
        jax.config.update("jax_default_prng_impl", prng_impl)
    enable_compilation_cache(cache_dir)

"""Profiling + numerical-debug utility tests."""

import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multilingual_multimodal_speech_emotion_recognition_tpu.utils import (
    debug, profiling)


def test_step_timer_stats():
    t = profiling.StepTimer()
    for _ in range(5):
        with t:
            time.sleep(0.01)
    s = t.stats()
    assert s["steps"] == 5
    assert 5 < s["mean_ms"] < 100
    assert s["p99_ms"] >= s["p50_ms"]


def test_throughput_meter():
    m = profiling.ThroughputMeter()
    m.add(100, 2.0)
    m.add(100, 2.0)
    assert m.per_sec() == pytest.approx(50.0)
    assert m.per_sec(n_chips=2) == pytest.approx(25.0)


def test_sync_and_memory_stats():
    x = jnp.ones((8, 8)) * 2
    profiling.sync(x)          # must not raise
    stats = profiling.device_memory_stats()
    assert isinstance(stats, dict)


def test_checked_catches_nan():
    def f(x):
        y = jnp.log(x)          # NaN for negative input
        debug.assert_finite(y, "log_x")
        return y.sum()

    checked = jax.jit(debug.checked(f))
    err, out = checked(jnp.asarray([1.0, 2.0]))
    err.throw()                  # clean
    err2, _ = checked(jnp.asarray([-1.0, 2.0]))
    with pytest.raises(Exception):
        err2.throw()


def test_tree_finite_report():
    tree = {"a": jnp.asarray([1.0, 2.0]),
            "b": {"c": jnp.asarray([jnp.nan, 1.0])}}
    rep = debug.tree_finite_report(tree)
    assert rep["a"][0] is True
    assert rep["b/c"][0] is False


def test_step_keys_deterministic():
    base = jax.random.key(0)
    k1 = debug.step_keys(base, 7)
    k2 = debug.step_keys(base, 7)
    k3 = debug.step_keys(base, 8)
    assert jnp.array_equal(jax.random.key_data(k1), jax.random.key_data(k2))
    assert not jnp.array_equal(jax.random.key_data(k1),
                               jax.random.key_data(k3))
    ks = debug.step_keys(base, 3, n=4)
    assert ks.shape[0] == 4


def test_compilation_cache_persists_programs(tmp_path):
    """runtime.enable_compilation_cache writes compiled programs to disk:
    a fresh process compiling the same jitted fn must hit the cache (the
    lever that turns 5-300 s relayed-TPU compiles into sub-second loads).
    Subprocess-based: cache config must land before backend init."""
    import subprocess, sys, pathlib
    root = pathlib.Path(__file__).resolve().parent.parent
    prog = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from multilingual_multimodal_speech_emotion_recognition_tpu.utils"
        " import runtime\n"
        f"d = runtime.enable_compilation_cache({str(tmp_path)!r})\n"
        "assert d\n"
        "import jax.numpy as jnp\n"
        "f = jax.jit(lambda x: (x @ x.T).sum())\n"
        "print(float(f(jnp.ones((64, 64)))))\n")
    for _ in range(2):
        proc = subprocess.run([sys.executable, "-c", prog], cwd=root,
                              capture_output=True, text=True, timeout=120)
        assert proc.returncode == 0, proc.stderr[-1500:]
    entries = list(tmp_path.iterdir())
    assert entries, "no cache entries written"


def test_runtime_configure_disable_via_env(tmp_path, monkeypatch):
    from multilingual_multimodal_speech_emotion_recognition_tpu.utils import (
        runtime)
    monkeypatch.setenv("SER_TPU_CACHE_DIR", "off")
    assert runtime.enable_compilation_cache() == ""
    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("SER_TPU_CACHE_DIR", str(tmp_path / "c"))
        assert runtime.enable_compilation_cache() == str(tmp_path / "c")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)

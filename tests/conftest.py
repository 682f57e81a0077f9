"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (pjit over a data/model Mesh) is validated without TPU
hardware via a virtual 8-device CPU backend — the JAX-idiomatic fake
backend (SURVEY.md §4).

Environment quirk: this box pins JAX_PLATFORMS=axon and injects an axon
sitecustomize (via PYTHONPATH) that imports jax at interpreter startup and
routes every compile through a remote TPU relay with tens of seconds of
latency. jax is therefore already in sys.modules with the axon platform
baked into the env-derived config default — but XLA *backends* initialize
lazily, so flipping the config here (before any computation runs) is
sufficient to keep the whole test suite on the local CPU backend.
"""

import os

# XLA's in-process CPU collectives ABORT the process when a rendezvous
# exceeds 40 s; one starved virtual-device thread on a loaded host kills the
# whole pytest run spuriously. Raise the deadline — these are correctness
# tests, not latency tests. (Backends initialize lazily, so setting the env
# here, before any computation, still takes effect.)
_flags = os.environ.get("XLA_FLAGS", "")
if "collective_call_terminate_timeout" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_cpu_collective_call_terminate_timeout_seconds=600"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_report_header(config):
    return f"jax devices: {jax.device_count()} x {jax.devices()[0].platform}"

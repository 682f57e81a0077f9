"""Numerical-safety tooling for jitted code.

TPU equivalent of the reference's scattered NaN guards (SURVEY.md §5.2 —
losses.py:26-29, prototypes.py:50-52, train_crema.py:360-368):
checkify-based NaN/Inf assertions that run INSIDE jit, a pytree finiteness
scan for host-side debugging, and deterministic PRNG threading helpers
replacing the reference's unseeded torch.rand augmentation.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn, *, errors=checkify.float_checks):
    """Wrap a jittable fn with checkify float checks (NaN/Inf produced
    anywhere inside raises on err.throw()). Returns (err, out) like
    checkify.checkify.

    Usage:
        err, out = jax.jit(debug.checked(step))(params, batch)
        err.throw()   # host-side, raises with the failing primitive
    """
    return checkify.checkify(fn, errors=errors)


def assert_finite(x: jax.Array, name: str = "value") -> jax.Array:
    """In-jit finiteness assertion (active under `checked`)."""
    checkify.check(jnp.all(jnp.isfinite(x)), f"{name} contains NaN/Inf")
    return x


def tree_finite_report(tree) -> Dict[str, Tuple[bool, float, float]]:
    """Host-side scan: path -> (finite?, min, max). For post-mortems."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jax.device_get(leaf)
        if hasattr(arr, "dtype") and jnp.issubdtype(arr.dtype, jnp.floating):
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            import numpy as np
            out[key] = (bool(np.isfinite(arr).all()),
                        float(arr.min()) if arr.size else 0.0,
                        float(arr.max()) if arr.size else 0.0)
    return out


def step_keys(base_key: jax.Array, step: int, n: int = 1):
    """Deterministic per-step PRNG derivation (replaces the reference's
    unseeded torch.rand augmentation, SURVEY.md §5.2): fold the step index
    into the key, then split."""
    k = jax.random.fold_in(base_key, step)
    return jax.random.split(k, n) if n > 1 else k

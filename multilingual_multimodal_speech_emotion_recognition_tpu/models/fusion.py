"""Gated modality fusion.

Parity target: FusionLayer (/root/reference/src/models/fusion.py:5-25):
project pooled audio/text vectors to proj_dim via 2-layer MLPs, compute a
scalar sigmoid gate per modality, normalize the two gates, return the
weighted sum.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import layers

Array = jax.Array


def init_fusion(key: Array, audio_dim: int, text_dim: int, proj_dim: int,
                dtype=jnp.float32) -> dict:
    gate_hidden = max(32, proj_dim // 2)
    ks = jax.random.split(key, 8)
    return {
        "proj_a1": layers.init_linear(ks[0], audio_dim, proj_dim, dtype=dtype),
        "proj_a2": layers.init_linear(ks[1], proj_dim, proj_dim, dtype=dtype),
        "proj_t1": layers.init_linear(ks[2], text_dim, proj_dim, dtype=dtype),
        "proj_t2": layers.init_linear(ks[3], proj_dim, proj_dim, dtype=dtype),
        "gate_a1": layers.init_linear(ks[4], proj_dim, gate_hidden, dtype=dtype),
        "gate_a2": layers.init_linear(ks[5], gate_hidden, 1, dtype=dtype),
        "gate_t1": layers.init_linear(ks[6], proj_dim, gate_hidden, dtype=dtype),
        "gate_t2": layers.init_linear(ks[7], gate_hidden, 1, dtype=dtype),
    }


def fusion(params: dict, audio_vec: Array, text_vec: Array,
           *, dropout_rate: float = 0.1, dropout_key: Optional[Array] = None,
           deterministic: bool = True) -> Array:
    """audio_vec: [B, Da], text_vec: [B, Dt] -> fused [B, proj_dim]."""
    if dropout_key is not None:
        ka, kt = jax.random.split(dropout_key)
    else:
        ka = kt = None
    a = layers.linear(params["proj_a1"], audio_vec)
    a = jax.nn.relu(a)
    a = layers.dropout(ka, a, dropout_rate, deterministic)
    a = layers.linear(params["proj_a2"], a)

    t = layers.linear(params["proj_t1"], text_vec)
    t = jax.nn.relu(t)
    t = layers.dropout(kt, t, dropout_rate, deterministic)
    t = layers.linear(params["proj_t2"], t)

    wa = jax.nn.sigmoid(layers.linear(params["gate_a2"],
                                      jax.nn.relu(layers.linear(params["gate_a1"], a))))
    wt = jax.nn.sigmoid(layers.linear(params["gate_t2"],
                                      jax.nn.relu(layers.linear(params["gate_t1"], t))))
    wsum = wa + wt + 1e-8
    wa, wt = wa / wsum, wt / wsum
    return wa * a + wt * t

"""Masked attentive-statistics pooling.

Parity target: AttentiveStatsPooling in the reference
(/root/reference/src/models/pooling.py:8-28): per-frame score from a
Linear(D,H)->tanh->Linear(H,1) MLP, masked softmax over time, then the
attention-weighted mean and std concatenated to [B, 2D].

Built as one fused XLA computation over the padded batch. A Pallas
streaming-kernel variant exists in ops/pallas_kernels.py
(attentive_stats_pooling_pallas) but is deliberately NOT wired here: at
flagship shapes the op is launch-bound and XLA's fusion wins (measured
numbers in the kernel's docstring) — keep this path on XLA unless that
measurement changes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models import layers

Array = jax.Array


def init_attentive_stats_pooling(key: Array, input_dim: int, hidden_dim: int = 128,
                                 dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "w1": layers.init_linear(k1, input_dim, hidden_dim, dtype=dtype),
        "w2": layers.init_linear(k2, hidden_dim, 1, dtype=dtype),
    }


def attentive_stats_pooling(params: dict, x: Array, mask: Optional[Array] = None,
                            *, eps: float = 1e-6) -> Array:
    """x: [B, S, D]; mask: [B, S] (1 valid / 0 pad). Returns [B, 2D]."""
    scores = layers.linear(params["w2"], jnp.tanh(layers.linear(params["w1"], x)))
    scores = jnp.squeeze(scores, axis=-1).astype(jnp.float32)  # [B, S]
    if mask is not None:
        scores = jnp.where(mask == 0, -jnp.inf, scores)
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)[..., None]  # [B, S, 1]
    mean = jnp.sum(attn * x, axis=1)  # [B, D]
    var = jnp.sum(attn * jnp.square(x - mean[:, None, :]), axis=1)
    std = jnp.sqrt(var + eps)
    return jnp.concatenate([mean, std], axis=-1)

"""Prototype memory and its pull/push loss.

Parity target: PrototypeMemory (/root/reference/src/models/prototypes.py:5-53):
learnable [C, D] prototypes (0.02 * randn init); loss = mean L2 to own
prototype + margin - mean soft-min(-logsumexp(-d)) distance to other
prototypes, with the reference's clamps (embeddings to [-10,10], negative
distances capped at 10) and non-finite -> 0 guard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def init_prototypes(key: Array, num_classes: int, dim: int, dtype=jnp.float32) -> dict:
    return {"prototypes": 0.02 * jax.random.normal(key, (num_classes, dim), dtype)}


def prototype_loss(params: dict, embeddings: Array, labels: Array,
                   *, margin: float = 0.5) -> Array:
    protos = params["prototypes"].astype(jnp.float32)
    emb = jnp.clip(embeddings.astype(jnp.float32), -10.0, 10.0)

    pos = jnp.mean(jnp.linalg.norm(emb - protos[labels], axis=1))

    sq = jnp.sum(jnp.square(emb[:, None, :] - protos[None, :, :]), axis=2)  # [B, C]
    dists = jnp.sqrt(sq + 1e-6)
    num_classes = protos.shape[0]
    own = jax.nn.one_hot(labels, num_classes, dtype=bool)
    neg_dists = jnp.where(own, jnp.inf, dists)
    neg_dists = jnp.clip(neg_dists, max=10.0)
    neg = jnp.mean(-jax.scipy.special.logsumexp(-neg_dists, axis=1))

    loss = pos + margin - neg
    return jnp.where(jnp.isfinite(loss), loss, 0.0)

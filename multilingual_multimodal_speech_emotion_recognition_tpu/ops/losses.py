"""Training losses.

Parity targets (/root/reference/src/models/losses.py):
  * label_smoothing_cross_entropy  — losses.py:7-30 (smoothing 0.1, logits
    clamped to [-10, 10], non-finite guards).
  * class_balanced_focal_loss      — losses.py:33-64 (per-batch bincount ->
    effective-number weights, beta=0.9999, gamma=2.0).
  * supcon_loss                    — losses.py:67-88 (temp 0.07; defined but
    disabled in the reference trainer — kept as a first-class option here).
  * uncertainty regularizer        — /root/reference/src/train.py:163-165.

All losses compute in float32 regardless of activation dtype and are pure
functions, so the full multi-term objective fuses into the jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def label_smoothing_cross_entropy(logits: Array, targets: Array,
                                  *, smoothing: float = 0.1) -> Array:
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    targets = jnp.clip(targets.astype(jnp.int32), 0, max(0, num_classes - 1))
    logits = jnp.clip(logits, -10.0, 10.0)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    log_probs = jnp.nan_to_num(log_probs, neginf=-1e9)
    true_dist = jnp.full_like(log_probs, smoothing / (num_classes - 1))
    onehot = jax.nn.one_hot(targets, num_classes, dtype=log_probs.dtype)
    true_dist = jnp.where(onehot > 0, 1.0 - smoothing, true_dist)
    loss = jnp.sum(-true_dist * log_probs, axis=-1)
    loss = jnp.nan_to_num(loss, nan=0.0, posinf=1e6, neginf=1e6)
    loss = jnp.mean(loss)
    return jnp.where(jnp.isfinite(loss), loss, 0.0)


def class_balanced_focal_loss(logits: Array, targets: Array, *,
                              num_classes: int, beta: float = 0.9999,
                              gamma: float = 2.0) -> Array:
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.int32)

    counts = jnp.clip(
        jnp.sum(jax.nn.one_hot(targets, num_classes, dtype=jnp.float32), axis=0),
        min=1.0)
    # 1 - beta^c with beta ~ 1 is cancellation-prone in f32; -expm1(c*log(beta))
    # is the accurate form (reference computes the naive expression in f32,
    # losses.py:46 — differences are pure rounding, ~1e-3 relative).
    effective_num = jnp.clip(-jnp.expm1(counts * jnp.log(beta)), min=1e-6)
    weights = (1.0 - beta) / effective_num
    weights = weights / (jnp.sum(weights) + 1e-8) * num_classes
    weights = jax.lax.stop_gradient(weights)

    logits = jnp.clip(logits, -10.0, 10.0)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(log_probs)
    onehot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    pt = jnp.clip(jnp.sum(probs * onehot, axis=-1), 1e-6, 1.0)
    focal_weight = jnp.power(1.0 - pt, gamma)
    # torch F.cross_entropy(weight=w, reduction='none') multiplies the
    # per-sample NLL by w[target].
    ce = -jnp.sum(log_probs * onehot, axis=-1) * weights[targets]
    loss = jnp.mean(focal_weight * ce)
    return jnp.where(jnp.isfinite(loss), loss, 0.0)


def supcon_loss(features: Array, labels: Array, *, temperature: float = 0.07) -> Array:
    features = features.astype(jnp.float32)
    eps = 1e-12
    f = features / jnp.maximum(jnp.linalg.norm(features, axis=-1, keepdims=True), eps)
    logits = (f @ f.T) / temperature
    logits = logits - jnp.max(logits, axis=1, keepdims=True)
    same = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    not_self = 1.0 - jnp.eye(features.shape[0], dtype=jnp.float32)
    mask = same * not_self
    exp_logits = jnp.exp(logits) * not_self
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True) + 1e-12)
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / (jnp.sum(mask, axis=1) + 1e-12)
    return -jnp.mean(mean_log_prob_pos)


def uncertainty_regularizer(uncertainty: Array, logits: Array, targets: Array) -> Array:
    """mean(uncertainty * 1[pred == target]) — encourages low uncertainty on
    correct predictions (reference train.py:163-165)."""
    correct = (jnp.argmax(logits, axis=-1) == targets).astype(jnp.float32)
    return jnp.mean(uncertainty.astype(jnp.float32).squeeze(-1) * correct)

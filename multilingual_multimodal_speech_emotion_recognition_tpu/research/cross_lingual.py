"""Cross-lingual variance handling: gradient-reversal adversarial head,
Houlsby adapters, consistency loss.

Parity with /root/reference/src/models/cross_lingual_variance.py:
  * GradientReversalLayer: identity forward, −α·grad backward (:19-47),
    here a jax.custom_vjp
  * LanguageAdversarialHead: GRL → 256→128→64→7 MLP (:50-130)
  * AdapterLayer LN→down(64)→ReLU→up→residual (:133-170); like the
    reference's simplified implementation it applies on final hidden
    states (:249-258), which our model already realizes as the bottleneck
    adapters in models/model.py — re-exposed here for standalone use
  * CrossLingualConsistencyLoss: MSE pulling cosine/temperature sims of
    same-emotion different-language pairs toward 1; temp 0.1, weight 0.05
    (:325-387)
  * combined objective emotion_CE − λ·language_CE + consistency (:476-511)
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..models import layers

Array = jax.Array

NUM_LANGUAGES = 7   # en es fr de hi bn te (cross_lingual_variance.py head)
CONSISTENCY_TEMPERATURE = 0.1
CONSISTENCY_WEIGHT = 0.05


# ------------------------------------------------------- gradient reversal

@jax.custom_vjp
def gradient_reversal(x: Array, alpha: float = 1.0) -> Array:
    return x


def _grl_fwd(x, alpha):
    return x, alpha


def _grl_bwd(alpha, g):
    return (-alpha * g, None)


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)


# ---------------------------------------------------- adversarial LID head

def init_language_head(key: Array, feature_dim: int = 256,
                       num_languages: int = NUM_LANGUAGES,
                       dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "l1": layers.init_linear(k1, feature_dim, 128, dtype=dtype),
        "l2": layers.init_linear(k2, 128, 64, dtype=dtype),
        "l3": layers.init_linear(k3, 64, num_languages, dtype=dtype),
    }


def language_adversarial_head(params: dict, features: Array, *,
                              alpha: float = 1.0,
                              dropout_rate: float = 0.1,
                              dropout_key: Optional[Array] = None,
                              deterministic: bool = True) -> Array:
    """[B, D] emotion features -> [B, num_languages] logits. Gradients
    into `features` are reversed, making them language-invariant."""
    x = gradient_reversal(features, alpha)
    if dropout_key is not None:
        k1, k2 = jax.random.split(dropout_key)
    else:
        k1 = k2 = None
    x = jax.nn.relu(layers.linear(params["l1"], x))
    x = layers.dropout(k1, x, dropout_rate, deterministic)
    x = jax.nn.relu(layers.linear(params["l2"], x))
    x = layers.dropout(k2, x, dropout_rate, deterministic)
    return layers.linear(params["l3"], x)


# ----------------------------------------------------------------- adapter

def init_adapter(key: Array, hidden_dim: int, bottleneck: int = 64,
                 dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "ln": layers.init_layer_norm(hidden_dim, dtype),
        "down": layers.init_linear(k1, hidden_dim, bottleneck, dtype=dtype),
        "up": layers.init_linear(k2, bottleneck, hidden_dim, dtype=dtype),
    }


def adapter(params: dict, x: Array) -> Array:
    """Houlsby adapter: LN → down → ReLU → up → residual (:133-170)."""
    h = layers.layer_norm(params["ln"], x)
    h = jax.nn.relu(layers.linear(params["down"], h))
    return x + layers.linear(params["up"], h)


# -------------------------------------------------------- consistency loss

def consistency_loss(embeddings: Array, emotion_labels: Array,
                     language_ids: Array, *,
                     temperature: float = CONSISTENCY_TEMPERATURE,
                     weight: float = CONSISTENCY_WEIGHT) -> Array:
    """MSE((sim/temp)[same emotion, different language], 1) · weight
    (:340-387)."""
    B = embeddings.shape[0]
    norm = embeddings / jnp.maximum(
        jnp.linalg.norm(embeddings, axis=-1, keepdims=True), 1e-8)
    sim = norm @ norm.T / temperature
    emo_mask = (emotion_labels[:, None] == emotion_labels[None, :])
    lang_mask = (language_ids[:, None] != language_ids[None, :])
    mask = (emo_mask & lang_mask).astype(sim.dtype)
    mask = mask * (1.0 - jnp.eye(B, dtype=sim.dtype))
    n = mask.sum()
    mse = jnp.where(n > 0, (((sim - 1.0) ** 2) * mask).sum() / jnp.maximum(n, 1.0),
                    0.0)
    return weight * mse


# -------------------------------------------------------- combined losses

def cross_lingual_losses(emotion_logits: Array, emotion_labels: Array,
                         language_logits: Array, language_labels: Array,
                         consistency: Array,
                         lambda_adversarial: float = 0.1) -> Dict[str, Array]:
    """total = emotion_CE − λ·language_CE + consistency (:496-511).
    NB: because the language logits came through the GRL, the −λ scaling
    here matches the reference's objective sign convention exactly."""
    def ce(logits, labels):
        logp = jax.nn.log_softmax(logits)
        return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()

    emotion_loss = ce(emotion_logits, emotion_labels)
    language_loss = ce(language_logits, language_labels)
    total = emotion_loss - lambda_adversarial * language_loss + consistency
    return {"emotion_loss": emotion_loss, "language_loss": language_loss,
            "consistency_loss": consistency, "total_loss": total}

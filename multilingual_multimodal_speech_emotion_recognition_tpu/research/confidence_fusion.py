"""Confidence-aware fusion: dynamic gating MLP, policy clamps, adaptive
fusion layer.

Parity with /root/reference/src/models/confidence_aware_fusion.py:
  * 14-scalar confidence vector with its normalizations (:10-56)
  * DynamicGatingMLP 14→32→16→2 softmax, final layer zero-init so weights
    start equal (:59-113)
  * PolicyBasedClamps — 5 hard rules (:116-206), vectorized over the batch
    with jnp.where (the reference branches on python floats per sample)
  * AdaptiveFusionLayer: per-modality projections (Linear→ReLU→Drop→LN→
    Linear), weighted sum, 14→32→proj/4 confidence projection concat, final
    fusion MLP, sigmoid fusion-confidence head (:209-402)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models import layers

Array = jax.Array

CONFIDENCE_DIM = 14

# thresholds (confidence_aware_fusion.py:124-133)
SNR_LOW = 10.0
ASR_CONF_LOW = 0.5
LID_ENTROPY_HIGH = 1.5
SPEECH_PROB_LOW = 0.7


class ConfidenceFeatures(NamedTuple):
    """Raw (un-normalized) per-utterance confidence scalars, each [B]."""
    snr_db: Array
    speech_prob: Array
    clipping_percent: Array
    denoise_gain_db: Array
    asr_conf_segment: Array
    lid_entropy: Array
    text_reliability_score: Array
    conditioning_applied: Array
    quality_gates_passed: Array
    audio_text_similarity: Array
    boundary_confidence: Array
    segment_emotion_consistency: Array
    previous_segment_confidence: Array
    emotion_transition_probability: Array

    def to_array(self) -> Array:
        """Normalized [B, 14] vector (confidence_aware_fusion.py:39-56)."""
        return jnp.stack([
            self.snr_db / 50.0,
            self.speech_prob,
            self.clipping_percent / 100.0,
            self.denoise_gain_db / 20.0,
            self.asr_conf_segment,
            self.lid_entropy / 2.0,
            self.text_reliability_score,
            self.conditioning_applied.astype(jnp.float32),
            self.quality_gates_passed.astype(jnp.float32),
            self.audio_text_similarity,
            self.boundary_confidence,
            self.segment_emotion_consistency,
            self.previous_segment_confidence,
            self.emotion_transition_probability,
        ], axis=-1)


def default_confidence_features(B: int) -> ConfidenceFeatures:
    """Neutral defaults for missing upstream signals."""
    ones = jnp.ones((B,), jnp.float32)
    zeros = jnp.zeros((B,), jnp.float32)
    return ConfidenceFeatures(
        snr_db=20.0 * ones, speech_prob=ones, clipping_percent=zeros,
        denoise_gain_db=zeros, asr_conf_segment=ones, lid_entropy=zeros,
        text_reliability_score=ones, conditioning_applied=zeros,
        quality_gates_passed=ones, audio_text_similarity=0.5 * ones,
        boundary_confidence=ones, segment_emotion_consistency=ones,
        previous_segment_confidence=0.5 * ones,
        emotion_transition_probability=0.5 * ones)


# ------------------------------------------------------- dynamic gating MLP

def init_dynamic_gating(key: Array, confidence_dim: int = CONFIDENCE_DIM,
                        hidden_dim: int = 32, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "l1": layers.init_linear(k1, confidence_dim, hidden_dim, dtype=dtype),
        "l2": layers.init_linear(k2, hidden_dim, hidden_dim // 2, dtype=dtype),
        "l3": layers.init_linear(k3, hidden_dim // 2, 2, dtype=dtype),
    }
    # zero-init the output layer -> equal weights after softmax (:85-88)
    p["l3"]["kernel"] = jnp.zeros_like(p["l3"]["kernel"])
    p["l3"]["bias"] = jnp.zeros_like(p["l3"]["bias"])
    return p


def dynamic_gating(params: dict, conf: Array, *, dropout_rate: float = 0.1,
                   dropout_key: Optional[Array] = None,
                   deterministic: bool = True) -> tuple[Array, Array]:
    """[B, 14] -> (audio_weight [B,1], text_weight [B,1]) summing to 1."""
    if dropout_key is not None:
        k1, k2 = jax.random.split(dropout_key)
    else:
        k1 = k2 = None
    x = jax.nn.relu(layers.linear(params["l1"], conf))
    x = layers.dropout(k1, x, dropout_rate, deterministic)
    x = jax.nn.relu(layers.linear(params["l2"], x))
    x = layers.dropout(k2, x, dropout_rate, deterministic)
    w = jax.nn.softmax(layers.linear(params["l3"], x), axis=-1)
    return w[:, 0:1], w[:, 1:2]


# ----------------------------------------------------------- policy clamps

def policy_clamps(audio_w: Array, text_w: Array,
                  feats: ConfidenceFeatures) -> tuple[Array, Array]:
    """The 5 rules of confidence_aware_fusion.py:159-206, vectorized.
    Weights are [B, 1]; features [B]."""
    snr = feats.snr_db[:, None]
    asr = feats.asr_conf_segment[:, None]
    ent = feats.lid_entropy[:, None]
    speech = feats.speech_prob[:, None]

    # 1: SNR < 10 dB -> audio <= 0.3, text = 1 - audio
    low_snr = snr < SNR_LOW
    audio_w = jnp.where(low_snr, jnp.minimum(audio_w, 0.3), audio_w)
    text_w = jnp.where(low_snr, 1.0 - audio_w, text_w)

    # 2: ASR conf < 0.5 -> text <= 0.4, audio = 1 - text
    low_asr = asr < ASR_CONF_LOW
    text_w = jnp.where(low_asr, jnp.minimum(text_w, 0.4), text_w)
    audio_w = jnp.where(low_asr, 1.0 - text_w, audio_w)

    # 3: LID entropy > 1.5 -> scale both x0.7 then renormalize
    high_ent = ent > LID_ENTROPY_HIGH
    audio_w = jnp.where(high_ent, audio_w * 0.7, audio_w)
    text_w = jnp.where(high_ent, text_w * 0.7, text_w)
    tot = audio_w + text_w
    audio_w = jnp.where(high_ent, audio_w / tot, audio_w)
    text_w = jnp.where(high_ent, text_w / tot, text_w)

    # 4: speech prob < 0.7 -> audio <= 0.2, text = 1 - audio
    low_speech = speech < SPEECH_PROB_LOW
    audio_w = jnp.where(low_speech, jnp.minimum(audio_w, 0.2), audio_w)
    text_w = jnp.where(low_speech, 1.0 - audio_w, text_w)

    # 5: both unreliable -> 0.5 / 0.5
    audio_bad = (snr < 5.0) & (speech < 0.5)
    text_bad = (asr < 0.3) & (ent > 2.0)
    both = audio_bad & text_bad
    audio_w = jnp.where(both, 0.5, audio_w)
    text_w = jnp.where(both, 0.5, text_w)

    tot = audio_w + text_w
    return audio_w / tot, text_w / tot


# --------------------------------------------------- adaptive fusion layer

def _init_proj(key, in_dim, out_dim, dtype):
    k1, k2 = jax.random.split(key)
    return {"l1": layers.init_linear(k1, in_dim, out_dim, dtype=dtype),
            "ln": layers.init_layer_norm(out_dim, dtype),
            "l2": layers.init_linear(k2, out_dim, out_dim, dtype=dtype)}


def _proj(p, x, *, rate, key, deterministic):
    x = jax.nn.relu(layers.linear(p["l1"], x))
    x = layers.dropout(key, x, rate, deterministic)
    x = layers.layer_norm(p["ln"], x)
    return layers.linear(p["l2"], x)


def init_adaptive_fusion(key: Array, audio_dim: int, text_dim: int,
                         proj_dim: int = 256, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8)
    return {
        "audio_proj": _init_proj(ks[0], audio_dim, proj_dim, dtype),
        "text_proj": _init_proj(ks[1], text_dim, proj_dim, dtype),
        "gating": init_dynamic_gating(ks[2], dtype=dtype),
        "conf_proj": {
            "l1": layers.init_linear(ks[3], CONFIDENCE_DIM, 32, dtype=dtype),
            "l2": layers.init_linear(ks[4], 32, proj_dim // 4, dtype=dtype)},
        "fusion": _init_proj(ks[5], proj_dim + proj_dim // 4, proj_dim, dtype),
        "conf_head": {
            "l1": layers.init_linear(ks[6], proj_dim, 64, dtype=dtype),
            "l2": layers.init_linear(ks[7], 64, 1, dtype=dtype)},
    }


def adaptive_fusion(params: dict, audio_vec: Array, text_vec: Array,
                    feats: ConfidenceFeatures, *, dropout_rate: float = 0.1,
                    dropout_key: Optional[Array] = None,
                    deterministic: bool = True):
    """Returns (fused [B, proj], fusion_confidence [B, 1], info dict)."""
    if dropout_key is not None:
        k1, k2, k3, k4, k5 = jax.random.split(dropout_key, 5)
    else:
        k1 = k2 = k3 = k4 = k5 = None
    ap = _proj(params["audio_proj"], audio_vec, rate=dropout_rate, key=k1,
               deterministic=deterministic)
    tp = _proj(params["text_proj"], text_vec, rate=dropout_rate, key=k2,
               deterministic=deterministic)

    conf = feats.to_array()
    aw, tw = dynamic_gating(params["gating"], conf,
                            dropout_rate=dropout_rate, dropout_key=k3,
                            deterministic=deterministic)
    aw, tw = policy_clamps(aw, tw, feats)

    weighted = aw * ap + tw * tp
    cp = jax.nn.relu(layers.linear(params["conf_proj"]["l1"], conf))
    cp = layers.dropout(k4, cp, dropout_rate, deterministic)
    cp = layers.linear(params["conf_proj"]["l2"], cp)

    fused = _proj(params["fusion"], jnp.concatenate([weighted, cp], -1),
                  rate=dropout_rate, key=k5, deterministic=deterministic)

    h = jax.nn.relu(layers.linear(params["conf_head"]["l1"], fused))
    fusion_conf = jax.nn.sigmoid(layers.linear(params["conf_head"]["l2"], h))
    info = {"audio_weight": aw, "text_weight": tw}
    return fused, fusion_conf, info

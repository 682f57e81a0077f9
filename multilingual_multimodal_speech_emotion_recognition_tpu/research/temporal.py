"""Temporal modeling: positional encoding, causal TCN, confidence-aware
smoothing, speaker-change detection, sliding segment buffer.

Parity with /root/reference/src/models/temporal_modeling.py:
  * sin/cos positional encoding over ≤10 segment slots (:23-68)
  * CausalConv1d (left-pad (k−1)·dilation, LayerNorm over channels,
    dropout; :71-138) and the 2-layer TCN 256→128→256 with dilations 1,2,
    residual add + final LayerNorm (:141-213)
  * ConfidenceAwareSmoothing: α = cur/(cur+hist); keep the current
    prediction outright when conf > 0.9; final conf = max(cur, hist)
    floored at 0.3 (:216-289)
  * SpeakerChangeDetector: cosine of projected consecutive embeddings
    < 0.7 → change (:292-362)
  * TemporalBuffer: the reference's stateful deque(maxlen=3) becomes a
    fixed-shape functional carry (buffer array + count) usable inside scan
    (:365-430)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import layers

Array = jax.Array

MAX_SEGMENTS = 10
BUFFER_SIZE = 3
SMOOTHING_THRESHOLD = 0.9
MIN_CONFIDENCE = 0.3
SPEAKER_CHANGE_THRESHOLD = 0.7


def positional_encoding(num_slots: int = MAX_SEGMENTS,
                        dim: int = 256) -> np.ndarray:
    """Standard sin/cos PE table [num_slots, dim] (:23-68)."""
    pos = np.arange(num_slots)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, dim, 2) * (-np.log(10000.0) / dim))
    pe = np.zeros((num_slots, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


# ------------------------------------------------------------- causal TCN

def init_causal_conv(key: Array, in_ch: int, out_ch: int, kernel: int,
                     dtype=jnp.float32) -> dict:
    w = layers.xavier_uniform(key, (out_ch, in_ch, kernel), dtype)
    return {"w": w, "b": jnp.zeros((out_ch,), dtype),
            "ln": layers.init_layer_norm(out_ch, dtype)}


def causal_conv(params: dict, x: Array, *, dilation: int = 1,
                dropout_rate: float = 0.1,
                dropout_key: Optional[Array] = None,
                deterministic: bool = True) -> Array:
    """[B, S, C_in] -> [B, S, C_out], strictly causal (left padding)."""
    kernel = params["w"].shape[-1]
    pad = (kernel - 1) * dilation
    xp = jnp.pad(x, [(0, 0), (pad, 0), (0, 0)])
    y = jax.lax.conv_general_dilated(
        xp, params["w"], window_strides=(1,), padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "OIW", "NWC"))
    y = y + params["b"]
    y = layers.layer_norm(params["ln"], y)
    return layers.dropout(dropout_key, y, dropout_rate, deterministic)


def init_tcn(key: Array, feature_dim: int = 256, hidden_dim: int = 128,
             kernel: int = 3, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {"layer1": init_causal_conv(k1, feature_dim, hidden_dim, kernel, dtype),
            "layer2": init_causal_conv(k2, hidden_dim, feature_dim, kernel, dtype),
            "out_ln": layers.init_layer_norm(feature_dim, dtype)}


def tcn(params: dict, x: Array, *, dropout_rate: float = 0.1,
        dropout_key: Optional[Array] = None,
        deterministic: bool = True) -> Array:
    """2-layer causal TCN with residual (temporal_modeling.py:141-213).
    x: [B, S, feature_dim]."""
    if dropout_key is not None:
        k1, k2 = jax.random.split(dropout_key)
    else:
        k1 = k2 = None
    h = jax.nn.relu(causal_conv(params["layer1"], x, dilation=1,
                                dropout_rate=dropout_rate, dropout_key=k1,
                                deterministic=deterministic))
    h = jax.nn.relu(causal_conv(params["layer2"], h, dilation=2,
                                dropout_rate=dropout_rate, dropout_key=k2,
                                deterministic=deterministic))
    return layers.layer_norm(params["out_ln"], x + h)


# -------------------------------------------------- confidence smoothing

def confidence_smoothing(current_pred: Array, current_conf: Array,
                         temporal_pred: Array, temporal_conf: Array
                         ) -> Tuple[Array, Array]:
    """(smoothed_pred, final_conf) — temporal_modeling.py:216-289."""
    current_conf = jnp.clip(current_conf, 0.0, 1.0)
    temporal_conf = jnp.clip(temporal_conf, 0.0, 1.0)
    alpha = current_conf / (current_conf + temporal_conf + 1e-8)
    keep = current_conf > SMOOTHING_THRESHOLD
    smoothed = jnp.where(keep, current_pred,
                         alpha * current_pred + (1 - alpha) * temporal_pred)
    final_conf = jnp.maximum(current_conf, temporal_conf)
    return smoothed, jnp.maximum(final_conf, MIN_CONFIDENCE)


# ------------------------------------------------- speaker change detector

def init_speaker_detector(key: Array, embed_dim: int = 256,
                          proj_dim: int = 128, dtype=jnp.float32) -> dict:
    return {"proj": layers.init_linear(key, embed_dim, proj_dim, dtype=dtype)}


def speaker_change(params: dict, prev_embed: Array, cur_embed: Array
                   ) -> Tuple[Array, Array]:
    """(changed [B] bool, similarity [B]) — cosine of projections < 0.7
    (temporal_modeling.py:292-362)."""
    a = layers.linear(params["proj"], prev_embed)
    b = layers.linear(params["proj"], cur_embed)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-8)
    sim = (a * b).sum(-1)
    return sim < SPEAKER_CHANGE_THRESHOLD, sim


# --------------------------------------------------------- segment buffer

class TemporalBufferState(NamedTuple):
    """Fixed-shape functional rewrite of the reference's deque(maxlen=3):
    ring buffer of segment features/confidences + fill count."""
    features: Array     # [B, BUFFER_SIZE, D]
    confidences: Array  # [B, BUFFER_SIZE]
    count: Array        # [B] int32 (saturates at BUFFER_SIZE)


def init_buffer(B: int, dim: int, size: int = BUFFER_SIZE) -> TemporalBufferState:
    return TemporalBufferState(
        features=jnp.zeros((B, size, dim), jnp.float32),
        confidences=jnp.zeros((B, size), jnp.float32),
        count=jnp.zeros((B,), jnp.int32))


def buffer_push(state: TemporalBufferState, feat: Array, conf: Array
                ) -> TemporalBufferState:
    """Append a segment (shift-left ring; oldest drops once full)."""
    features = jnp.concatenate([state.features[:, 1:], feat[:, None]], axis=1)
    confs = jnp.concatenate([state.confidences[:, 1:], conf[:, None]], axis=1)
    count = jnp.minimum(state.count + 1, state.features.shape[1])
    return TemporalBufferState(features=features, confidences=confs,
                               count=count)


def buffer_valid_mask(state: TemporalBufferState) -> Array:
    """[B, size] mask over filled slots (newest at the end)."""
    size = state.features.shape[1]
    slots = jnp.arange(size)
    return (slots[None, :] >= (size - state.count[:, None])).astype(jnp.float32)


# ------------------------------------------------------------ full module

def init_temporal_module(key: Array, feature_dim: int = 256,
                         num_emotions: int = 4, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "tcn": init_tcn(ks[0], feature_dim, feature_dim // 2, dtype=dtype),
        "speaker": init_speaker_detector(ks[1], feature_dim, dtype=dtype),
        "emotion_head": layers.init_linear(ks[2], feature_dim, num_emotions,
                                           dtype=dtype),
        "conf_head": layers.init_linear(ks[3], feature_dim, 1, dtype=dtype),
        "pe": jnp.asarray(positional_encoding(MAX_SEGMENTS, feature_dim)),
    }


def temporal_step(params: dict, state: TemporalBufferState, feat: Array,
                  conf: Array, *, deterministic: bool = True,
                  dropout_key: Optional[Array] = None):
    """One segment through the full temporal module: push → PE → TCN over
    the buffered window → heads → confidence smoothing. Returns
    (new_state, smoothed_logits [B,C], final_conf [B,1], info)."""
    new_state = buffer_push(state, feat, conf[:, 0])
    mask = buffer_valid_mask(new_state)                       # [B, W]
    window = new_state.features + params["pe"][:mask.shape[1]][None]
    h = tcn(params["tcn"], window, deterministic=deterministic,
            dropout_key=dropout_key)                          # [B, W, D]
    current = h[:, -1]                                        # newest slot
    logits = layers.linear(params["emotion_head"], current)
    cur_conf = jax.nn.sigmoid(layers.linear(params["conf_head"], current))

    # historical average over previously-filled slots (excluding current)
    hist_mask = mask.at[:, -1].set(0.0)
    denom = jnp.maximum(hist_mask.sum(-1, keepdims=True), 1.0)
    hist_conf = (new_state.confidences * hist_mask).sum(-1, keepdims=True) / denom
    hist_logits = layers.linear(
        params["emotion_head"],
        (h * hist_mask[..., None]).sum(1) / denom)

    smoothed, final_conf = confidence_smoothing(logits, cur_conf,
                                                hist_logits, hist_conf)
    prev_feat = state.features[:, -1]
    changed, sim = speaker_change(params["speaker"], prev_feat, feat)
    # first segment: no previous speaker -> no change flag
    changed = changed & (state.count > 0)
    info = {"speaker_changed": changed, "speaker_similarity": sim,
            "current_confidence": cur_conf, "historical_confidence": hist_conf}
    return new_state, smoothed, final_conf, info

"""Bidirectional cross-modal attention.

Parity target: CrossModalAttention (/root/reference/src/models/cross_attention.py:6-53):
audio queries text and text queries audio. Each direction projects its inputs
into a shared 256-d space (q/k/v linears), runs 8-head attention with
key-padding masks, projects back to the modality dim, and applies
dropout + residual + LayerNorm.

Here both directions run inside one jitted function; the attention itself is
layers.mha (XLA) with a Pallas flash variant selectable for long audio
sequences (ops/pallas/flash_attention.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import layers

Array = jax.Array


def init_cross_modal_attention(key: Array, audio_dim: int, text_dim: int,
                               shared_dim: int = 256, num_heads: int = 8,
                               dtype=jnp.float32) -> dict:
    assert shared_dim % num_heads == 0
    ks = jax.random.split(key, 10)
    return {
        "q_a": layers.init_linear(ks[0], audio_dim, shared_dim, dtype=dtype),
        "k_t": layers.init_linear(ks[1], text_dim, shared_dim, dtype=dtype),
        "v_t": layers.init_linear(ks[2], text_dim, shared_dim, dtype=dtype),
        "attn_a": layers.init_mha(ks[3], shared_dim, num_heads, dtype=dtype),
        "out_a": layers.init_linear(ks[4], shared_dim, audio_dim, dtype=dtype),
        "q_t": layers.init_linear(ks[5], text_dim, shared_dim, dtype=dtype),
        "k_a": layers.init_linear(ks[6], audio_dim, shared_dim, dtype=dtype),
        "v_a": layers.init_linear(ks[7], audio_dim, shared_dim, dtype=dtype),
        "attn_t": layers.init_mha(ks[8], shared_dim, num_heads, dtype=dtype),
        "out_t": layers.init_linear(ks[9], shared_dim, text_dim, dtype=dtype),
        "norm_a": layers.init_layer_norm(audio_dim, dtype=dtype),
        "norm_t": layers.init_layer_norm(text_dim, dtype=dtype),
    }


def cross_modal_attention(params: dict, audio_seq: Array, text_seq: Array,
                          audio_mask: Optional[Array] = None,
                          text_mask: Optional[Array] = None,
                          *, num_heads: int = 8, dropout_rate: float = 0.1,
                          dropout_key: Optional[Array] = None,
                          deterministic: bool = True) -> Tuple[Array, Array]:
    """audio_seq: [B, Sa, Da]; text_seq: [B, St, Dt]; masks 1=valid/0=pad.

    Returns (audio_enhanced [B,Sa,Da], text_enhanced [B,St,Dt]).
    """
    if dropout_key is not None:
        k_aa, k_ar, k_ta, k_tr = jax.random.split(dropout_key, 4)
    else:
        k_aa = k_ar = k_ta = k_tr = None

    # Audio attends to text.
    qa = layers.linear(params["q_a"], audio_seq)
    kt = layers.linear(params["k_t"], text_seq)
    vt = layers.linear(params["v_t"], text_seq)
    a_ctx = layers.mha(params["attn_a"], qa, kt, vt, num_heads=num_heads,
                       key_padding_mask=text_mask, dropout_rate=dropout_rate,
                       dropout_key=k_aa, deterministic=deterministic)
    a_out = layers.linear(params["out_a"], a_ctx)
    a_out = layers.dropout(k_ar, a_out, dropout_rate, deterministic)
    audio_enh = layers.layer_norm(params["norm_a"], audio_seq + a_out)

    # Text attends to audio.
    qt = layers.linear(params["q_t"], text_seq)
    ka = layers.linear(params["k_a"], audio_seq)
    va = layers.linear(params["v_a"], audio_seq)
    t_ctx = layers.mha(params["attn_t"], qt, ka, va, num_heads=num_heads,
                       key_padding_mask=audio_mask, dropout_rate=dropout_rate,
                       dropout_key=k_ta, deterministic=deterministic)
    t_out = layers.linear(params["out_t"], t_ctx)
    t_out = layers.dropout(k_tr, t_out, dropout_rate, deterministic)
    text_enh = layers.layer_norm(params["norm_t"], text_seq + t_out)

    return audio_enh, text_enh

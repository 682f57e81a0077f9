"""XLM-RoBERTa text encoder, TPU-native.

Capability parity with the frozen `xlm-roberta-base` backbone used by the
reference TextEncoder (/root/reference/src/models/text_encoder.py:11-17):
word + position (+ token-type) embeddings with RoBERTa's pad-offset position
ids, 12 post-layer-norm transformer layers, GELU FFN. Returns the last
hidden state; the reference never uses the pooler.

TPU-first: layers stacked [L, ...] and traversed with lax.scan (+ optional
remat); attention bias is additive -inf on padded keys; converts HF
checkpoints weight-for-weight via hf_convert.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from . import layers, remat as remat_lib

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class XLMRConfig:
    vocab_size: int = 250002
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1


def init_xlmr(key: Array, cfg: XLMRConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 4 + cfg.num_hidden_layers)
    std = 0.02

    emb = {
        "word": jax.random.normal(ks[0], (cfg.vocab_size, cfg.hidden_size), dtype) * std,
        "position": jax.random.normal(ks[1], (cfg.max_position_embeddings, cfg.hidden_size), dtype) * std,
        "token_type": jax.random.normal(ks[2], (cfg.type_vocab_size, cfg.hidden_size), dtype) * std,
        "ln": layers.init_layer_norm(cfg.hidden_size, dtype=dtype),
    }

    def one_layer(k):
        kk = jax.random.split(k, 6)
        h, ffn = cfg.hidden_size, cfg.intermediate_size

        def lin(k2, i, o):
            return {"kernel": jax.random.normal(k2, (i, o), dtype) * std,
                    "bias": jnp.zeros((o,), dtype)}

        return {
            "q": lin(kk[0], h, h), "k": lin(kk[1], h, h),
            "v": lin(kk[2], h, h), "out": lin(kk[3], h, h),
            "attn_ln": layers.init_layer_norm(h, dtype=dtype),
            "ffn_in": lin(kk[4], h, ffn),
            "ffn_out": lin(kk[5], ffn, h),
            "final_ln": layers.init_layer_norm(h, dtype=dtype),
        }

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[one_layer(k) for k in ks[4:]])
    return {"embeddings": emb, "layers": stacked}


def position_ids_from_input_ids(input_ids: Array, pad_token_id: int) -> Array:
    """RoBERTa's create_position_ids_from_input_ids: positions count only
    non-pad tokens and are offset by pad_token_id."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=-1) * mask + pad_token_id


def xlmr_encode(params: dict, cfg: XLMRConfig, input_ids: Array,
                attention_mask: Array, *, deterministic: bool = True,
                dropout_key: Optional[Array] = None,
                remat: bool = False) -> Array:
    """input_ids: [B, S] int32; attention_mask: [B, S] (1 valid).

    Returns last hidden state [B, S, hidden_size].
    """
    if dropout_key is not None:
        k_emb, k_enc = jax.random.split(dropout_key)
    else:
        k_emb = k_enc = None

    emb = params["embeddings"]
    pos_ids = position_ids_from_input_ids(input_ids, cfg.pad_token_id)
    h = (jnp.take(emb["word"], input_ids, axis=0)
         + jnp.take(emb["position"], pos_ids, axis=0)
         + emb["token_type"][0][None, None, :])
    h = layers.layer_norm(emb["ln"], h, eps=cfg.layer_norm_eps)
    h = layers.dropout(k_emb, h, cfg.hidden_dropout, deterministic)

    attn_bias = jnp.where(attention_mask[:, None, None, :] == 0, -jnp.inf, 0.0)

    H = cfg.num_attention_heads
    D = cfg.hidden_size // H
    scale = D ** -0.5

    def body(carry, layer):
        x, key = carry
        if key is not None:
            key, k1, k2, k3 = jax.random.split(key, 4)
        else:
            k1 = k2 = k3 = None
        B, S, E = x.shape
        q = (layers.linear(layer["q"], x) * scale).reshape(B, S, H, D)
        k = layers.linear(layer["k"], x).reshape(B, S, H, D)
        v = layers.linear(layer["v"], x).reshape(B, S, H, D)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) + attn_bias
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        attn = layers.dropout(k1, attn, cfg.attention_dropout, deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, S, E)
        ctx = layers.linear(layer["out"], ctx)
        ctx = layers.dropout(k2, ctx, cfg.hidden_dropout, deterministic)
        x = layers.layer_norm(layer["attn_ln"], x + ctx, eps=cfg.layer_norm_eps)

        f = layers.gelu(layers.linear(layer["ffn_in"], x))
        f = layers.linear(layer["ffn_out"], f)
        f = layers.dropout(k3, f, cfg.hidden_dropout, deterministic)
        x = layers.layer_norm(layer["final_ln"], x + f, eps=cfg.layer_norm_eps)
        return (x, key), None

    body = remat_lib.apply_remat(body, remat)
    (out, _), _ = jax.lax.scan(body, (h, k_enc), params["layers"])
    return out

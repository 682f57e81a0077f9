"""Parameterized primitive layers as pure functions over pytrees.

Every layer is a pair of functions:

  ``init_*(key, ...) -> params``  — build a parameter pytree
  ``*(params, x, ...) -> y``      — apply it (pure; jit/vmap/scan friendly)

Weight layout conventions (chosen so HF/PyTorch checkpoints convert with a
single transpose):

  * ``linear``:    ``{"kernel": [in, out], "bias": [out]}``
  * ``layer_norm``: ``{"scale": [dim], "bias": [dim]}``
  * ``mha``: separate q/k/v/out projections, each a ``linear``.

Dropout is expressed explicitly: callers pass a PRNG key and a ``deterministic``
flag; no global RNG state exists anywhere (reference relies on torch's global
RNG — see /root/reference/src/train.py:131-141).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# initializers (match torch defaults where parity matters)
# ---------------------------------------------------------------------------

def xavier_uniform(key: Array, shape, dtype=jnp.float32) -> Array:
    """torch.nn.init.xavier_uniform_ for a [in, out] kernel."""
    fan_in, fan_out = shape[0], shape[-1]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def kaiming_uniform_linear(key: Array, shape, dtype=jnp.float32) -> Array:
    """torch.nn.Linear's default weight init (kaiming_uniform, a=sqrt(5))
    for a kernel stored as [in, out]."""
    fan_in = shape[0]
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def linear_bias_uniform(key: Array, fan_in: int, shape, dtype=jnp.float32) -> Array:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------

def init_linear(key: Array, in_dim: int, out_dim: int, *, use_bias: bool = True,
                init: str = "torch", dtype=jnp.float32) -> dict:
    kw, kb = jax.random.split(key)
    if init == "xavier":
        kernel = xavier_uniform(kw, (in_dim, out_dim), dtype)
        bias_fn = lambda k: jnp.zeros((out_dim,), dtype)
    else:  # torch default
        kernel = kaiming_uniform_linear(kw, (in_dim, out_dim), dtype)
        bias_fn = lambda k: linear_bias_uniform(k, in_dim, (out_dim,), dtype)
    p = {"kernel": kernel}
    if use_bias:
        p["bias"] = bias_fn(kb)
    return p


def linear(params: dict, x: Array) -> Array:
    if "kernel_q" in params:  # int8-quantized serving slot (ops/quant.py)
        from ..ops import quant
        return quant.linear_int8(params, x)
    y = jnp.einsum("...i,io->...o", x, params["kernel"])
    if "bias" in params:
        y = y + params["bias"]
    return y


# ---------------------------------------------------------------------------
# layer norm
# ---------------------------------------------------------------------------

def init_layer_norm(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def gelu(x: Array) -> Array:
    """GELU matching the backbone parity contract per dtype: exact erf in
    f32 (HF's default for wav2vec2/XLM-R), tanh approximation in bf16 —
    the approximation's ~1e-3 error sits below bf16's own ~4e-3 rounding,
    and the exact erf costs ~2x on the VPU (measured on v5e:
    [64,12800,512] gelu exact 7.9 ms vs tanh 4.3 ms vs relu floor 4.5 ms)."""
    return jax.nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


def layer_norm(params: dict, x: Array, *, eps: float = 1e-5) -> Array:
    # Compute the moments in f32 regardless of activation dtype (bf16-safe).
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# dropout
# ---------------------------------------------------------------------------

def dropout(key: Optional[Array], x: Array, rate: float, deterministic: bool) -> Array:
    if deterministic or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# multi-head attention (torch.nn.MultiheadAttention-compatible layout)
# ---------------------------------------------------------------------------

def init_mha(key: Array, embed_dim: int, num_heads: int, dtype=jnp.float32) -> dict:
    """Same parameterization as torch.nn.MultiheadAttention with
    batch_first=True and equal q/k/v dims: packed in_proj is split into
    q/k/v linears here; out_proj is a linear.

    torch initializes in_proj_weight with xavier_uniform over the packed
    [3E, E] matrix and zeros both biases; we replicate the fan computation
    of the packed matrix (fan_in=E, fan_out=3E).
    """
    kq, kk, kv, ko = jax.random.split(key, 4)
    a = math.sqrt(6.0 / (embed_dim + 3 * embed_dim))
    mk = lambda k: jax.random.uniform(k, (embed_dim, embed_dim), dtype, -a, a)
    out_kernel = kaiming_uniform_linear(ko, (embed_dim, embed_dim), dtype)
    return {
        "q": {"kernel": mk(kq), "bias": jnp.zeros((embed_dim,), dtype)},
        "k": {"kernel": mk(kk), "bias": jnp.zeros((embed_dim,), dtype)},
        "v": {"kernel": mk(kv), "bias": jnp.zeros((embed_dim,), dtype)},
        "out": {"kernel": out_kernel, "bias": jnp.zeros((embed_dim,), dtype)},
    }


def mha(params: dict, q: Array, k: Array, v: Array, *, num_heads: int,
        key_padding_mask: Optional[Array] = None,
        dropout_rate: float = 0.0, dropout_key: Optional[Array] = None,
        deterministic: bool = True) -> Array:
    """Multi-head attention matching torch.nn.MultiheadAttention semantics.

    q: [B, Sq, E], k/v: [B, Sk, E]
    key_padding_mask: [B, Sk] with 1 for VALID, 0 for PAD (note: this is the
    *inverse* of torch's convention — the reference passes ``mask == 0`` as
    the torch key_padding_mask, i.e. True==pad; we take the raw valid-mask,
    matching /root/reference/src/models/cross_attention.py:33-35).
    """
    B, Sq, E = q.shape
    Sk = k.shape[1]
    H = num_heads
    D = E // H

    qh = linear(params["q"], q).reshape(B, Sq, H, D)
    kh = linear(params["k"], k).reshape(B, Sk, H, D)
    vh = linear(params["v"], v).reshape(B, Sk, H, D)

    # scaled dot-product, softmax in f32
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32)
    logits = logits / math.sqrt(D)
    if key_padding_mask is not None:
        pad = (key_padding_mask == 0)[:, None, None, :]  # [B,1,1,Sk]
        logits = jnp.where(pad, -jnp.inf, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    # torch produces NaNs for fully-masked query rows; guard identically only
    # if every key is padded (never happens with >=1 valid token).
    attn = attn.astype(q.dtype)
    if dropout_rate > 0.0 and not deterministic:
        attn = dropout(dropout_key, attn, dropout_rate, deterministic)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, Sq, E)
    return linear(params["out"], ctx)

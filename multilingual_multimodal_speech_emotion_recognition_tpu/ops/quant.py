"""Int8 weight quantization for the serving path.

TPU-native capability beyond the reference (whose only precision lever is
torch.amp, src/train.py:88): v5e's MXU doubles its throughput at int8
(~394 TOPs vs ~197 bf16 TFLOPs), and the frozen backbones — the bulk of
inference FLOPs — are exactly the weights that tolerate post-training
quantization. Scheme:

  * weights: symmetric per-output-channel int8 (scale = max|W|/127 over
    the input dim), computed once offline by `quantize_backbones`;
  * activations: dynamic symmetric per-row int8 (scale over the feature
    dim), computed on the fly in `linear_int8`;
  * accumulation in int32 (`preferred_element_type`), dequantized by
    a_scale x w_scale in f32, bias added, cast back to the compute dtype.

Quantized linears keep the regular param-tree slot with keys
{kernel_q, w_scale[, bias]}; `models/layers.py:linear` dispatches on the
presence of `kernel_q`, so every call site (encoder stacks under
lax.scan, adapters, heads) works unchanged. `w_scale` is held in f32 and
excluded from `cast_floating` (models/model.py) so bf16 serving does not
round the dequantization scales.

Stacked (scan-over-layers) kernels [L, I, O] quantize per (layer, output
channel); inside the scan each slice is a regular [I, O] quantized linear.
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-12


def quantize_linear(p: dict) -> dict:
    """{kernel[, bias]} -> {kernel_q, w_scale[, bias]}; kernel [..., I, O]."""
    w = p["kernel"].astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=-2) / 127.0, _EPS)  # [..., O]
    q = jnp.clip(jnp.round(w / s[..., None, :]), -127, 127).astype(jnp.int8)
    out = {"kernel_q": q, "w_scale": s}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def linear_int8(params: dict, x: Array) -> Array:
    """Dynamic-activation int8 matmul: y = (x_q · W_q) * s_a * s_w + b."""
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    a_scale = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, _EPS)
    xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, params["kernel_q"],
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * a_scale * params["w_scale"].astype(jnp.float32)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(out_dtype)


def _walk(node, min_size: int):
    if isinstance(node, dict):
        k = node.get("kernel")
        if k is not None and getattr(k, "ndim", 0) >= 2 \
                and min(k.shape[-2:]) >= min_size:
            return quantize_linear(node)
        return {key: _walk(v, min_size) for key, v in node.items()}
    return node


def quantize_whisper(params: dict, *, min_size: int = 512) -> dict:
    """Int8 the Whisper encoder/decoder transformer matmuls (attention
    q/k/v/out, cross-attention, FFN — the scan-stacked [L, I, O] kernels).
    The mel convs, layer norms, positional tables, and the tied token
    embedding stay float: `_walk` only descends the "layers" stacks, and
    the logits projection reads the embedding table directly.

    The lever this targets: KV-cached greedy decode is weight-HBM-bound —
    every generated token re-reads the full decoder stack (large-v3:
    ~0.9 B layer params ≈ 1.9 GB at bf16 per token), so halving the
    weight bytes is the serving win, on top of the int8 MXU's 2× TOPs
    (reference fallback loads large-v3: asr_integration.py:74-81)."""
    out = dict(params)
    for key in ("encoder", "decoder"):
        if key in out and "layers" in out[key]:
            sub = dict(out[key])
            sub["layers"] = _walk(sub["layers"], min_size)
            out[key] = sub
    return out


def quantize_backbones(params: dict, *,
                       subtrees: Iterable[str] = ("audio_backbone",
                                                  "text_backbone"),
                       min_size: int = 512) -> dict:
    """Quantize the big encoder matmuls (q/k/v/out/ffn of both frozen
    backbones) in a model param tree; everything else — conv extractor,
    norms, adapters, heads, the parity-critical classifier — stays float.
    `min_size` filters small matrices (relpos gates, biases) whose error
    would be all overhead and no speedup."""
    out = dict(params)
    for key in subtrees:
        if key in out:
            sub = dict(out[key])
            if "layers" in sub:
                sub["layers"] = _walk(sub["layers"], min_size)
            out[key] = sub
    return out

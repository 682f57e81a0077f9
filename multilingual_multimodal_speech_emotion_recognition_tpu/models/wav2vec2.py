"""Wav2Vec2 audio encoder, TPU-native.

Capability parity with the frozen `facebook/wav2vec2-base` backbone used by
the reference AudioEncoder (/root/reference/src/models/audio_encoder.py:13-17):
7-layer strided conv feature extractor (group-norm on layer 0), feature
projection, grouped positional conv embedding, 12 post-layer-norm
transformer layers.

Key TPU-first differences from the reference's per-clip Python loop
(audio_encoder.py:65-145):

  * Fully batched over padded waveforms with explicit masks. The reference
    runs one clip at a time precisely because HF's batched wav2vec2-base is
    NOT padding-invariant (its group norm and waveform normalization see the
    pad). Here both are *masked* statistics, so the batched result equals
    the reference's per-sample result for every valid frame — one big MXU
    program instead of B tiny ones.
  * Transformer layers are stacked [L, ...] and traversed with lax.scan
    (+ optional jax.checkpoint), compiling once regardless of depth.
  * bf16-friendly: all normalization statistics accumulate in f32.

The HF checkpoint converts weight-for-weight via hf_convert.py.

Backbone family covered by this one module (BASELINE.md config matrix):
wav2vec2-base (group-norm conv, post-LN), wav2vec2-large / HuBERT-Large
(layer-norm conv + conv bias, stable pre-LN), and WavLM-Large
(stable pre-LN + gated bucketed relative position bias,
cfg.gated_relpos_bias — HF WavLMAttention).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import layers, remat as remat_lib

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = False
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-5
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    # Large-model variants (wav2vec2-large / HuBERT-Large; HF
    # do_stable_layer_norm=True uses pre-LN encoder blocks with a final LN
    # after the stack, feat_extract_norm="layer" gives every conv layer its
    # own channel LayerNorm instead of the single group norm on conv 0 —
    # those checkpoints also carry conv biases).
    do_stable_layer_norm: bool = False
    feat_extract_norm: str = "group"  # "group" | "layer"
    # WavLM variant (HF WavLMAttention): T5-style bucketed relative position
    # bias owned by layer 0 and shared down the stack, gated per layer/head/
    # query by a sigmoid GRU-style gate computed from the attention input.
    gated_relpos_bias: bool = False
    num_buckets: int = 320
    max_bucket_distance: int = 800
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    # SpecAugment (active in the reference's training because the frozen HF
    # encoder still runs in train mode — modeling_wav2vec2 masks hidden
    # states when config.apply_spec_augment and module.training).
    apply_spec_augment: bool = True
    mask_time_prob: float = 0.05
    mask_time_length: int = 10

    def feat_extract_output_lengths(self, input_lengths: Array) -> Array:
        """HF Wav2Vec2Model._get_feat_extract_output_lengths."""
        lengths = input_lengths
        for k, s in zip(self.conv_kernel, self.conv_stride):
            lengths = (lengths - k) // s + 1
        return lengths


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_wav2vec2(key: Array, cfg: Wav2Vec2Config, dtype=jnp.float32) -> dict:
    n_conv = len(cfg.conv_dim)
    keys = jax.random.split(key, n_conv + 6)

    convs = []
    in_c = 1
    for i in range(n_conv):
        k = cfg.conv_kernel[i]
        out_c = cfg.conv_dim[i]
        # HF init: kaiming_normal for conv weights
        std = math.sqrt(2.0 / (in_c * k))
        w = jax.random.normal(keys[i], (k, in_c, out_c), dtype) * std
        conv = {"kernel": w}
        if cfg.conv_bias:
            conv["bias"] = jnp.zeros((out_c,), dtype)
        if cfg.feat_extract_norm == "layer":
            conv["ln"] = layers.init_layer_norm(out_c, dtype=dtype)
        convs.append(conv)
        in_c = out_c

    gn = {"scale": jnp.ones((cfg.conv_dim[0],), dtype),
          "bias": jnp.zeros((cfg.conv_dim[0],), dtype)}

    kp, kpos, kenc, kmask = keys[n_conv:n_conv + 4]

    feat_proj = {
        "ln": layers.init_layer_norm(cfg.conv_dim[-1], dtype=dtype),
        "proj": layers.init_linear(kp, cfg.conv_dim[-1], cfg.hidden_size, dtype=dtype),
    }

    # positional conv: grouped Conv1d(hidden, hidden, k=128, groups=16)
    g = cfg.num_conv_pos_embedding_groups
    kk = cfg.num_conv_pos_embeddings
    in_per_group = cfg.hidden_size // g
    pos_std = math.sqrt(4.0 / (kk * cfg.hidden_size))  # HF: normal(0, 2/sqrt(k*h))
    pos_conv = {
        "kernel": jax.random.normal(kpos, (kk, in_per_group, cfg.hidden_size), dtype) * pos_std,
        "bias": jnp.zeros((cfg.hidden_size,), dtype),
    }

    def one_layer(k):
        ks = jax.random.split(k, 6)
        h, ffn = cfg.hidden_size, cfg.intermediate_size
        std = 0.02  # HF initializer_range

        def lin(kk2, i, o):
            return {"kernel": jax.random.normal(kk2, (i, o), dtype) * std,
                    "bias": jnp.zeros((o,), dtype)}

        p = {
            "q": lin(ks[0], h, h), "k": lin(ks[1], h, h),
            "v": lin(ks[2], h, h), "out": lin(ks[3], h, h),
            "attn_ln": layers.init_layer_norm(h, dtype=dtype),
            "ffn_in": lin(ks[4], h, ffn),
            "ffn_out": lin(ks[5], ffn, h),
            "final_ln": layers.init_layer_norm(h, dtype=dtype),
        }
        if cfg.gated_relpos_bias:
            head_dim = h // cfg.num_attention_heads
            p["gru_lin"] = lin(jax.random.fold_in(k, 101), head_dim, 8)
            p["gru_const"] = jnp.ones((cfg.num_attention_heads,), dtype)
        return p

    layer_keys = jax.random.split(kenc, cfg.num_hidden_layers)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[one_layer(k) for k in layer_keys])

    params = {
        "convs": convs,
        "feat_proj": feat_proj,
        "pos_conv": pos_conv,
        "encoder_ln": layers.init_layer_norm(cfg.hidden_size, dtype=dtype),
        "layers": stacked,
        "masked_spec_embed": jax.random.uniform(kmask, (cfg.hidden_size,), dtype),
    }
    if cfg.feat_extract_norm == "group":
        params["group_norm"] = gn
    if cfg.gated_relpos_bias:
        params["rel_attn_embed"] = (
            jax.random.normal(jax.random.fold_in(kmask, 7),
                              (cfg.num_buckets, cfg.num_attention_heads),
                              dtype) * 0.02)
    return params


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------

def normalize_waveform(wave: Array, mask: Array, eps: float = 1e-7) -> Array:
    """Per-sample zero-mean/unit-var over *valid* samples, zeros on padding
    (HF Wav2Vec2FeatureExtractor.zero_mean_unit_var_norm)."""
    wave = wave.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(wave * mask, axis=-1, keepdims=True) / n
    var = jnp.sum(jnp.square(wave - mean) * mask, axis=-1, keepdims=True) / n
    return (wave - mean) * jax.lax.rsqrt(var + eps) * mask


def _conv1d(p: dict, x: Array, stride: int, *, groups: int = 1,
            padding: int = 0) -> Array:
    """x: [B, T, C_in]; kernel [K, C_in/groups, C_out] -> [B, T', C_out]."""
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def masked_group_norm_per_channel(p: dict, x: Array, frame_mask: Array,
                                  eps: float = 1e-5) -> Array:
    """GroupNorm(C, C) == per-channel instance norm over time, with
    statistics restricted to valid frames so batched == per-sample.
    x: [B, T, C], frame_mask: [B, T]."""
    xf = x.astype(jnp.float32)
    m = frame_mask.astype(jnp.float32)[..., None]
    n = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    mean = jnp.sum(xf * m, axis=1, keepdims=True) / n
    var = jnp.sum(jnp.square(xf - mean) * m, axis=1, keepdims=True) / n
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def feature_encoder(params: dict, cfg: Wav2Vec2Config, wave: Array,
                    sample_mask: Array, *,
                    allow_fused: bool = False) -> Tuple[Array, Array]:
    """Strided conv stack: [B, T] -> ([B, T7, 512], frame_mask [B, T7]).

    `allow_fused=True` routes the six stride-2 tail layers (kernels
    3,3,3,3,2,2 — ~31% of the flagship's FLOPs) through one VMEM-resident
    Pallas kernel (ops/pallas_kernels.conv_tail_pallas). MEASURED SLOWER
    on v5e and left off by default: whole extractor @ B=32/4 s bf16 is
    7.3 ms via lax.conv vs 14.0 ms fused (flat across tile sizes
    f7=16/32/64; scripts/tpu_conv_tail_bench.py). XLA's conv path already
    runs ~45% MXU with GELU fused into the conv epilogue and HBM traffic
    overlapped, while the kernel's per-tile MXU -> VPU(gelu) -> pair-fold
    chain is serial (~16 us/step: 7.6 matmul + ~4 gelu + ~4 fold) — the
    extractor is compute/VPU-balanced, not memory-bound, so removing the
    inter-layer HBM traffic buys nothing. Values match within bf16
    rounding either way (tests force the fused path in interpret mode)."""
    from ..ops import pallas_kernels as pk

    x = wave[..., None]  # [B, T, 1]
    lengths = jnp.sum(sample_mask.astype(jnp.int32), axis=-1)
    convs = params["convs"]
    use_fused = (
        allow_fused and wave.dtype == jnp.bfloat16 and pk.use_pallas()
        and pk.conv_tail_supported(cfg.conv_kernel, cfg.conv_stride,
                                   cfg.conv_dim))
    for i, conv in enumerate(convs):
        x = _conv1d(conv, x, cfg.conv_stride[i])
        lengths = (lengths - cfg.conv_kernel[i]) // cfg.conv_stride[i] + 1
        if cfg.feat_extract_norm == "layer":
            # per-frame channel LN (HF Wav2Vec2LayerNormConvLayer) — the
            # statistics are per (b, t), so batched == per-sample for free
            x = layers.layer_norm(conv["ln"], x, eps=cfg.layer_norm_eps)
        elif i == 0:
            fm = (jnp.arange(x.shape[1])[None, :] < lengths[:, None])
            x = masked_group_norm_per_channel(params["group_norm"], x, fm)
        x = layers.gelu(x)
        if i == 0 and use_fused:
            x = pk.conv_tail_pallas(
                convs, x, has_ln=(cfg.feat_extract_norm == "layer"),
                ln_eps=cfg.layer_norm_eps)
            for j in range(1, len(convs)):
                lengths = ((lengths - cfg.conv_kernel[j])
                           // cfg.conv_stride[j] + 1)
            break
    frame_mask = (jnp.arange(x.shape[1])[None, :] < lengths[:, None]).astype(x.dtype)
    return x, frame_mask


def _spec_augment(key: Array, cfg: Wav2Vec2Config, hidden: Array,
                  frame_mask: Array, masked_embed: Array) -> Array:
    """SpecAugment-style time masking (capability parity with HF
    _compute_mask_indices: each chosen start masks `mask_time_length`
    frames; expected coverage mask_time_prob)."""
    B, T, _ = hidden.shape
    p_start = cfg.mask_time_prob / cfg.mask_time_length * 2.0
    starts = jax.random.bernoulli(key, p_start, (B, T)).astype(jnp.float32)
    # dilate starts over mask_time_length frames via max-pool
    masked = jax.lax.reduce_window(
        starts, 0.0, jax.lax.max,
        window_dimensions=(1, cfg.mask_time_length),
        window_strides=(1, 1),
        padding=[(0, 0), (cfg.mask_time_length - 1, 0)])
    masked = masked * frame_mask
    return jnp.where(masked[..., None] > 0,
                     masked_embed.astype(hidden.dtype), hidden)


def _relative_positions_bucket(rel: Array, num_buckets: int,
                               max_distance: int) -> Array:
    """HF WavLMAttention._relative_positions_bucket (T5-style, bidirectional):
    half the buckets for sign, half of those exact, the rest log-spaced."""
    nb = num_buckets // 2
    out = (rel > 0).astype(jnp.int32) * nb
    rel = jnp.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return out + jnp.where(is_small, rel, large)


def relative_position_bias(params: dict, cfg: Wav2Vec2Config, T: int) -> Array:
    """Ungated bias [H, T, T] (f32) — HF WavLMAttention.compute_bias, computed
    once (layer 0 owns rel_attn_embed) and shared down the stack."""
    rel = jnp.arange(T)[None, :] - jnp.arange(T)[:, None]  # memory - context
    bucket = _relative_positions_bucket(rel, cfg.num_buckets,
                                        cfg.max_bucket_distance)
    values = params["rel_attn_embed"].astype(jnp.float32)[bucket]  # [T, T, H]
    return jnp.transpose(values, (2, 0, 1))


def _encoder_stack(stacked: dict, cfg: Wav2Vec2Config, h: Array,
                   attn_bias: Optional[Array], *, dropout_key, deterministic,
                   remat: bool, pos_bias: Optional[Array] = None) -> Array:
    H = cfg.num_attention_heads
    D = cfg.hidden_size // H
    scale = D ** -0.5

    def body(carry, layer):
        x, key = carry
        if key is not None:
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
        else:
            k1 = k2 = k3 = k4 = None
        B, S, E = x.shape

        def attention(xin):
            q = (layers.linear(layer["q"], xin) * scale).reshape(B, S, H, D)
            k = layers.linear(layer["k"], xin).reshape(B, S, H, D)
            v = layers.linear(layer["v"], xin).reshape(B, S, H, D)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
            if attn_bias is not None:
                logits = logits + attn_bias
            if pos_bias is not None:
                # gated relative position bias (HF WavLMAttention.forward):
                # gate computed from the attention *input* (post-LN input in
                # the stable-LN variant), per (batch, head, query)
                g = xin.reshape(B, S, H, D)
                proj = layers.linear(layer["gru_lin"], g)          # [B,S,H,8]
                proj = proj.reshape(B, S, H, 2, 4).sum(-1)         # [B,S,H,2]
                ga, gb = jnp.split(
                    jax.nn.sigmoid(proj.astype(jnp.float32)), 2, axis=-1)
                const = layer["gru_const"].astype(jnp.float32)
                gate = ga * (gb * const[None, None, :, None] - 1.0) + 2.0
                gate = jnp.transpose(gate, (0, 2, 1, 3))           # [B,H,S,1]
                logits = logits + gate * pos_bias[None]
            attn = jax.nn.softmax(logits, axis=-1).astype(xin.dtype)
            attn = layers.dropout(k1, attn, cfg.attention_dropout, deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, S, E)
            ctx = layers.linear(layer["out"], ctx)
            return layers.dropout(k2, ctx, cfg.hidden_dropout, deterministic)

        def ffn(xin):
            f = layers.gelu(layers.linear(layer["ffn_in"], xin))
            f = layers.dropout(k3, f, cfg.activation_dropout, deterministic)
            f = layers.linear(layer["ffn_out"], f)
            return layers.dropout(k4, f, cfg.hidden_dropout, deterministic)

        if cfg.do_stable_layer_norm:
            # pre-LN block (HF Wav2Vec2EncoderLayerStableLayerNorm)
            x = x + attention(
                layers.layer_norm(layer["attn_ln"], x, eps=cfg.layer_norm_eps))
            x = x + ffn(
                layers.layer_norm(layer["final_ln"], x, eps=cfg.layer_norm_eps))
        else:
            x = layers.layer_norm(layer["attn_ln"], x + attention(x),
                                  eps=cfg.layer_norm_eps)
            x = layers.layer_norm(layer["final_ln"], x + ffn(x),
                                  eps=cfg.layer_norm_eps)
        return (x, key), None

    body = remat_lib.apply_remat(body, remat)
    (out, _), _ = jax.lax.scan(body, (h, dropout_key), stacked)
    return out


def wav2vec2_encode(params: dict, cfg: Wav2Vec2Config, wave: Array,
                    sample_mask: Array, *, normalize: bool = True,
                    deterministic: bool = True,
                    dropout_key: Optional[Array] = None,
                    spec_augment: bool = False,
                    remat: bool = False) -> Tuple[Array, Array]:
    """wave: [B, T] raw audio @16 kHz; sample_mask: [B, T] (1 valid).

    Returns (hidden [B, T', hidden_size], frame_mask [B, T']).
    """
    if dropout_key is not None:
        k_spec, k_drop, k_enc = jax.random.split(dropout_key, 3)
    else:
        k_spec = k_drop = k_enc = None

    if normalize:
        # stats in f32, output back in the compute dtype: in bf16 mode the
        # conv extractor is HBM/VPU-bound (CLAUDE.md perf notes), and f32
        # activations would double its traffic (the reference's --use_amp
        # autocasts its conv path to half precision the same way)
        wave = normalize_waveform(wave, sample_mask).astype(wave.dtype)
    # allow_fused stays False: the Pallas conv-tail kernel measured SLOWER
    # than the lax.conv loop on v5e (see feature_encoder docstring)
    feats, frame_mask = feature_encoder(params, cfg, wave, sample_mask)

    h = layers.layer_norm(params["feat_proj"]["ln"], feats, eps=cfg.layer_norm_eps)
    h = layers.linear(params["feat_proj"]["proj"], h)

    if spec_augment and not deterministic and cfg.apply_spec_augment:
        h = _spec_augment(k_spec, cfg, h, frame_mask, params["masked_spec_embed"])

    # zero padded frames so the positional conv sees zeros (HF Encoder.forward)
    h = h * frame_mask[..., None].astype(h.dtype)
    pos = _conv1d(params["pos_conv"], h, 1,
                  groups=cfg.num_conv_pos_embedding_groups,
                  padding=cfg.num_conv_pos_embeddings // 2)
    # with even kernel and padding k//2 the conv yields T+1 frames; HF's
    # SamePadLayer drops the trailing one — slicing to T does both cases.
    pos = pos[:, : h.shape[1], :]
    pos = layers.gelu(pos)
    h = h + pos
    if not cfg.do_stable_layer_norm:
        # post-LN encoder normalizes before the stack (HF Wav2Vec2Encoder)
        h = layers.layer_norm(params["encoder_ln"], h, eps=cfg.layer_norm_eps)
    h = layers.dropout(k_drop, h, cfg.hidden_dropout, deterministic)

    attn_bias = jnp.where(frame_mask[:, None, None, :] == 0, -jnp.inf, 0.0)
    pos_bias = (relative_position_bias(params, cfg, h.shape[1])
                if cfg.gated_relpos_bias else None)
    h = _encoder_stack(params["layers"], cfg, h, attn_bias,
                       dropout_key=k_enc, deterministic=deterministic,
                       remat=remat, pos_bias=pos_bias)
    if cfg.do_stable_layer_norm:
        # stable-LN encoder normalizes after the stack
        # (HF Wav2Vec2EncoderStableLayerNorm.forward)
        h = layers.layer_norm(params["encoder_ln"], h, eps=cfg.layer_norm_eps)
    return h, frame_mask

"""TPU-native Whisper: encoder-decoder ASR with a jitted greedy decode.

The reference's ASR integration drives OpenAI Whisper through torch on
the HOST (/root/reference/src/models/asr_integration.py:59-293 — eager
per-clip `model.generate`). This module is the device-side counterpart:
the log-mel frontend, the conv+transformer encoder, and a KV-cached
greedy decoder all run as ONE jitted XLA program per (batch, max_tokens)
shape, so transcription batches onto the MXU like every other model here.

Architecture parity: transformers `WhisperForConditionalGeneration`
(whisper-tiny..large-v3 geometry):
  * log-mel: n_fft 400 / hop 160 / 80-128 Slaney-scale Slaney-norm mel
    filters, log10 clamped to max-8, (x+4)/4 — the exact
    WhisperFeatureExtractor recipe (transformers audio_utils
    mel_filter_bank), computed batched on device;
  * encoder: conv(k3,s1) -> GELU -> conv(k3,s2) -> GELU, + fixed
    sinusoidal positions, pre-LN transformer, final LN;
  * decoder: tied token embedding, learned positions, pre-LN blocks of
    causal self-attention (KV cache) + cross-attention + FFN, final LN,
    logits = x @ embed_tokens.T;
  * attention: q/v/out have biases, k does NOT (Whisper quirk);
  * greedy decode: lax.scan over steps, lax.scan over stacked layers
    inside the step; EOS freezes a row (emits pad, confidence 1 kept at
    the EOS step); per-step max-softmax confidences returned for the
    word-confidence pipeline (frontend/asr.py).

Weight conversion from an HF state_dict: `params_from_hf`. Numeric parity
(features, encoder states, greedy tokens + confidences) is pinned against
transformers on random-weight from-config fixtures in
tests/test_whisper.py; no pretrained weights are reachable in this
environment (zero egress), which bounds what can be validated here to
structure + numerics — as with the torch ASR backend (PARITY.md §2.3).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from . import layers

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 384                    # whisper-tiny
    encoder_layers: int = 4
    encoder_attention_heads: int = 6
    decoder_layers: int = 4
    decoder_attention_heads: int = 6
    encoder_ffn_dim: int = 1536
    decoder_ffn_dim: int = 1536
    max_source_positions: int = 1500
    max_target_positions: int = 448
    decoder_start_token_id: int = 50258
    eos_token_id: int = 50257
    layer_norm_eps: float = 1e-5


# --------------------------------------------------------------- log-mel

def _slaney_hz_to_mel(f):
    f = np.asarray(f, np.float64)
    mel = 3.0 * f / 200.0
    log_region = f >= 1000.0
    return np.where(log_region,
                    15.0 + np.log(np.maximum(f, 1e-10) / 1000.0)
                    / (np.log(6.4) / 27.0), mel)


def _slaney_mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f = 200.0 * m / 3.0
    log_region = m >= 15.0
    return np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0)
                                                * (m - 15.0)), f)


def mel_filter_bank(n_freqs: int = 201, n_mels: int = 80,
                    sample_rate: int = 16000,
                    fmin: float = 0.0, fmax: float = 8000.0) -> np.ndarray:
    """Slaney-scale, Slaney-normalized triangular filters [n_freqs, n_mels]
    — transformers.audio_utils.mel_filter_bank(norm='slaney',
    mel_scale='slaney'), the WhisperFeatureExtractor bank."""
    freqs = np.linspace(0, sample_rate / 2, n_freqs)
    mel_pts = np.linspace(_slaney_hz_to_mel(fmin), _slaney_hz_to_mel(fmax),
                          n_mels + 2)
    hz_pts = _slaney_mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[None, :] - freqs[:, None]           # [n_freqs, n_mels+2]
    down = -ramps[:, :-2] / fdiff[None, :-1]
    up = ramps[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))         # [n_freqs, n_mels]
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    return (fb * enorm[None, :]).astype(np.float32)


def log_mel_spectrogram(wave: Array, *, n_mels: int = 80, n_fft: int = 400,
                        hop: int = 160) -> Array:
    """[B, T] (T typically padded to 30 s = 480000) -> [B, n_mels, T//hop].

    The WhisperFeatureExtractor recipe exactly: periodic hann, centered
    reflect padding, DROP the final frame, power spectrum, Slaney mel,
    log10 clamped to (rowmax - 8), then (x + 4) / 4."""
    from ..frontend import spectral as sp
    B, T = wave.shape
    x = jnp.pad(wave.astype(jnp.float32),
                ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    frames = sp.frame_signal(x, n_fft, hop)[:, :-1]    # drop last frame
    win = jnp.asarray(sp.hann_window(n_fft))
    re, im = sp.framed_rfft(frames * win)
    power = re * re + im * im                          # [B, F, n_fft//2+1]
    fb = jnp.asarray(mel_filter_bank(n_fft // 2 + 1, n_mels))
    mel = jnp.einsum("bfk,km->bfm", power, fb)         # [B, F, n_mels]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(
        log_spec, log_spec.max(axis=(1, 2), keepdims=True) - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.swapaxes(log_spec, 1, 2)                # [B, n_mels, F]


# ------------------------------------------------------------ init/convert

def _init_attn(key, d, *, k_bias=False, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    p = {n: layers.init_linear(k, d, d, dtype=dtype)
         for n, k in zip(("q", "k", "v", "out"), ks)}
    if not k_bias:
        p["k"] = {"kernel": p["k"]["kernel"]}          # Whisper: k unbiased
    return p


def _init_enc_layer(key, cfg: WhisperConfig, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "attn": _init_attn(k1, cfg.d_model, dtype=dtype),
        "attn_ln": layers.init_layer_norm(cfg.d_model, dtype),
        "ffn_in": layers.init_linear(k2, cfg.d_model, cfg.encoder_ffn_dim,
                                     dtype=dtype),
        "ffn_out": layers.init_linear(k3, cfg.encoder_ffn_dim, cfg.d_model,
                                      dtype=dtype),
        "final_ln": layers.init_layer_norm(cfg.d_model, dtype),
    }


def _init_dec_layer(key, cfg: WhisperConfig, dtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "self_attn": _init_attn(k1, cfg.d_model, dtype=dtype),
        "self_ln": layers.init_layer_norm(cfg.d_model, dtype),
        "cross_attn": _init_attn(k2, cfg.d_model, dtype=dtype),
        "cross_ln": layers.init_layer_norm(cfg.d_model, dtype),
        "ffn_in": layers.init_linear(k3, cfg.d_model, cfg.decoder_ffn_dim,
                                     dtype=dtype),
        "ffn_out": layers.init_linear(k4, cfg.decoder_ffn_dim, cfg.d_model,
                                      dtype=dtype),
        "final_ln": layers.init_layer_norm(cfg.d_model, dtype),
    }


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed encoder positions (openai/whisper audio.py)."""
    log_timescale = math.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)],
                          axis=1).astype(np.float32)


def init_whisper(key: Array, cfg: WhisperConfig,
                 dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8)
    enc_layers = [_init_enc_layer(k, cfg, dtype)
                  for k in jax.random.split(ks[0], cfg.encoder_layers)]
    dec_layers = [_init_dec_layer(k, cfg, dtype)
                  for k in jax.random.split(ks[1], cfg.decoder_layers)]
    stack = lambda ls: jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *ls)
    d = cfg.d_model
    conv_scale = 1.0 / math.sqrt(3 * cfg.num_mel_bins)
    return {
        "encoder": {
            "conv1": {"kernel": jax.random.uniform(
                ks[2], (3, cfg.num_mel_bins, d), dtype,
                -conv_scale, conv_scale),
                "bias": jnp.zeros((d,), dtype)},
            "conv2": {"kernel": jax.random.uniform(
                ks[3], (3, d, d), dtype, -1 / math.sqrt(3 * d),
                1 / math.sqrt(3 * d)), "bias": jnp.zeros((d,), dtype)},
            "pos": jnp.asarray(_sinusoids(cfg.max_source_positions, d),
                               dtype),
            "layers": stack(enc_layers),
            "ln": layers.init_layer_norm(d, dtype),
        },
        "decoder": {
            "embed_tokens": (jax.random.normal(ks[4], (cfg.vocab_size, d),
                                               dtype) * 0.02),
            "pos": (jax.random.normal(ks[5], (cfg.max_target_positions, d),
                                      dtype) * 0.02),
            "layers": stack(dec_layers),
            "ln": layers.init_layer_norm(d, dtype),
        },
    }


def _lin_t(sd, name):
    p = {"kernel": np.asarray(sd[f"{name}.weight"]).T.copy()}
    if f"{name}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{name}.bias"]).copy()
    return p


def _ln_t(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"]).copy(),
            "bias": np.asarray(sd[f"{name}.bias"]).copy()}


def _attn_t(sd, prefix):
    return {n: _lin_t(sd, f"{prefix}.{m}") for n, m in
            (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
             ("out", "out_proj"))}


def params_from_hf(state_dict, cfg: WhisperConfig) -> dict:
    """transformers WhisperModel / WhisperForConditionalGeneration
    state_dict -> native tree (proj_out is tied to embed_tokens)."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}

    def enc_layer(i):
        p = f"encoder.layers.{i}"
        return {
            "attn": _attn_t(sd, f"{p}.self_attn"),
            "attn_ln": _ln_t(sd, f"{p}.self_attn_layer_norm"),
            "ffn_in": _lin_t(sd, f"{p}.fc1"),
            "ffn_out": _lin_t(sd, f"{p}.fc2"),
            "final_ln": _ln_t(sd, f"{p}.final_layer_norm"),
        }

    def dec_layer(i):
        p = f"decoder.layers.{i}"
        return {
            "self_attn": _attn_t(sd, f"{p}.self_attn"),
            "self_ln": _ln_t(sd, f"{p}.self_attn_layer_norm"),
            "cross_attn": _attn_t(sd, f"{p}.encoder_attn"),
            "cross_ln": _ln_t(sd, f"{p}.encoder_attn_layer_norm"),
            "ffn_in": _lin_t(sd, f"{p}.fc1"),
            "ffn_out": _lin_t(sd, f"{p}.fc2"),
            "final_ln": _ln_t(sd, f"{p}.final_layer_norm"),
        }

    stack = lambda ls: jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *ls)
    to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return {
        "encoder": {
            "conv1": {"kernel": jnp.asarray(
                np.asarray(sd["encoder.conv1.weight"]).transpose(2, 1, 0)),
                "bias": jnp.asarray(np.asarray(sd["encoder.conv1.bias"]))},
            "conv2": {"kernel": jnp.asarray(
                np.asarray(sd["encoder.conv2.weight"]).transpose(2, 1, 0)),
                "bias": jnp.asarray(np.asarray(sd["encoder.conv2.bias"]))},
            "pos": jnp.asarray(
                np.asarray(sd["encoder.embed_positions.weight"])),
            "layers": stack([enc_layer(i)
                             for i in range(cfg.encoder_layers)]),
            "ln": to_j(_ln_t(sd, "encoder.layer_norm")),
        },
        "decoder": {
            "embed_tokens": jnp.asarray(
                np.asarray(sd["decoder.embed_tokens.weight"])),
            "pos": jnp.asarray(
                np.asarray(sd["decoder.embed_positions.weight"])),
            "layers": stack([dec_layer(i)
                             for i in range(cfg.decoder_layers)]),
            "ln": to_j(_ln_t(sd, "decoder.layer_norm")),
        },
    }


# --------------------------------------------------------------- forward

def _attn(p, q_in, kv_in, num_heads, *, bias=None):
    """Pre-projected full attention (encoder / teacher-forced paths).
    bias: additive [.., Sq, Sk] or None."""
    B, Sq, E = q_in.shape
    Sk = kv_in.shape[1]
    H = num_heads
    D = E // H
    q = layers.linear(p["q"], q_in).reshape(B, Sq, H, D)
    k = layers.linear(p["k"], kv_in).reshape(B, Sk, H, D)
    v = layers.linear(p["v"], kv_in).reshape(B, Sk, H, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / math.sqrt(D)
    if bias is not None:
        s = s + bias
    a = jax.nn.softmax(s, axis=-1).astype(q_in.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, Sq, E)
    return layers.linear(p["out"], ctx)


def encode(params: dict, cfg: WhisperConfig, mel: Array) -> Array:
    """mel: [B, n_mels, frames] -> [B, frames//2, d_model]."""
    enc = params["encoder"]
    # match the param dtype: log_mel_spectrogram emits f32, but a serving
    # tree may be bf16 (large-v3 is init'd/served in bf16 — f32 params
    # alone would be 6.2 GiB HBM)
    x = jnp.swapaxes(mel, 1, 2).astype(enc["conv1"]["kernel"].dtype)

    def conv(p, x, stride):
        return jax.lax.conv_general_dilated(
            x, p["kernel"], window_strides=(stride,), padding=[(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC")) + p["bias"]

    x = jax.nn.gelu(conv(enc["conv1"], x, 1), approximate=False)
    x = jax.nn.gelu(conv(enc["conv2"], x, 2), approximate=False)
    S = x.shape[1]
    x = x + enc["pos"][:S][None]

    H = cfg.encoder_attention_heads

    def body(h, layer):
        a_in = layers.layer_norm(layer["attn_ln"], h, eps=cfg.layer_norm_eps)
        h = h + _attn(layer["attn"], a_in, a_in, H)
        f = layers.layer_norm(layer["final_ln"], h, eps=cfg.layer_norm_eps)
        f = layers.linear(layer["ffn_out"],
                          jax.nn.gelu(layers.linear(layer["ffn_in"], f),
                                      approximate=False))
        return h + f, None

    x, _ = jax.lax.scan(body, x, enc["layers"])
    return layers.layer_norm(enc["ln"], x, eps=cfg.layer_norm_eps)


def greedy_decode(params: dict, cfg: WhisperConfig, enc_out: Array,
                  prefix: Array, *, max_new_tokens: int = 32
                  ) -> Tuple[Array, Array]:
    """Jitted greedy generation.

    enc_out: [B, S, d] from `encode`; prefix: [B, P] forced decoder ids
    (start token (+ language/task ids for real checkpoints)). Returns
    (tokens [B, max_new_tokens], confidences [B, max_new_tokens]) —
    confidence is the per-step max softmax prob, the quantity the
    reference reads from generate(output_scores=True)
    (asr_integration.py:150-204). Rows freeze at EOS (token repeats EOS,
    confidence 1.0 after)."""
    dec = params["decoder"]
    B, P = prefix.shape
    H = cfg.decoder_attention_heads
    D = cfg.d_model // H
    S_max = P + max_new_tokens

    # cross K/V are fixed per layer: precompute [L, B, S_enc, H, D]
    def cross_kv(layer):
        k = layers.linear(layer["cross_attn"]["k"], enc_out)
        v = layers.linear(layer["cross_attn"]["v"], enc_out)
        Se = enc_out.shape[1]
        return (k.reshape(B, Se, H, D), v.reshape(B, Se, H, D))

    xk, xv = jax.lax.map(cross_kv, dec["layers"])

    k_cache = jnp.zeros((cfg.decoder_layers, B, S_max, H, D), enc_out.dtype)
    v_cache = jnp.zeros_like(k_cache)

    def one_step(state, _):
        k_cache, v_cache, tok, pos, finished = state
        x = (dec["embed_tokens"][tok] + dec["pos"][pos])[:, None, :]

        def layer_body(h, inputs):
            layer, xk_l, xv_l, kc_l, vc_l = inputs
            # causal self-attention over the cache
            q_in = layers.layer_norm(layer["self_ln"], h,
                                     eps=cfg.layer_norm_eps)
            q = layers.linear(layer["self_attn"]["q"],
                              q_in).reshape(B, 1, H, D)
            k_new = layers.linear(layer["self_attn"]["k"],
                                  q_in).reshape(B, H, D)
            v_new = layers.linear(layer["self_attn"]["v"],
                                  q_in).reshape(B, H, D)
            kc_l = jax.vmap(lambda c, n, p: jax.lax.dynamic_update_slice(
                c, n[None], (p, 0, 0)))(kc_l, k_new, pos)
            vc_l = jax.vmap(lambda c, n, p: jax.lax.dynamic_update_slice(
                c, n[None], (p, 0, 0)))(vc_l, v_new, pos)
            s = jnp.einsum("bqhd,bkhd->bhqk", q,
                           kc_l).astype(jnp.float32) / math.sqrt(D)
            valid = (jnp.arange(S_max)[None, :] <= pos[:, None])
            s = jnp.where(valid[:, None, None, :], s, -1e30)
            a = jax.nn.softmax(s, axis=-1).astype(h.dtype)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", a,
                             vc_l).reshape(B, 1, cfg.d_model)
            h = h + layers.linear(layer["self_attn"]["out"], ctx)
            # cross-attention (precomputed K/V)
            c_in = layers.layer_norm(layer["cross_ln"], h,
                                     eps=cfg.layer_norm_eps)
            qc = layers.linear(layer["cross_attn"]["q"],
                               c_in).reshape(B, 1, H, D)
            sc = jnp.einsum("bqhd,bkhd->bhqk", qc,
                            xk_l).astype(jnp.float32) / math.sqrt(D)
            ac = jax.nn.softmax(sc, axis=-1).astype(h.dtype)
            cc = jnp.einsum("bhqk,bkhd->bqhd", ac,
                            xv_l).reshape(B, 1, cfg.d_model)
            h = h + layers.linear(layer["cross_attn"]["out"], cc)
            # FFN
            f = layers.layer_norm(layer["final_ln"], h,
                                  eps=cfg.layer_norm_eps)
            f = layers.linear(layer["ffn_out"],
                              jax.nn.gelu(layers.linear(layer["ffn_in"], f),
                                          approximate=False))
            return h + f, (kc_l, vc_l)

        x, (k_cache, v_cache) = jax.lax.scan(
            layer_body, x, (dec["layers"], xk, xv, k_cache, v_cache))
        x = layers.layer_norm(dec["ln"], x, eps=cfg.layer_norm_eps)
        logits = (x[:, 0] @ dec["embed_tokens"].T).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        nxt = jnp.argmax(logits, axis=-1).astype(tok.dtype)
        conf = probs.max(axis=-1)
        nxt = jnp.where(finished, jnp.asarray(cfg.eos_token_id, tok.dtype),
                        nxt)
        conf = jnp.where(finished, 1.0, conf)
        finished = finished | (nxt == cfg.eos_token_id)
        return ((k_cache, v_cache, nxt, pos + 1, finished), (nxt, conf))

    # teacher-force the prefix (no outputs recorded), then generate
    state = (k_cache, v_cache, prefix[:, 0],
             jnp.zeros((B,), jnp.int32), jnp.zeros((B,), bool))
    for i in range(1, P):          # short static prefix: unrolled feed
        state, _ = one_step(state, None)
        k_c, v_c, _, pos, fin = state
        state = (k_c, v_c, prefix[:, i], pos, fin)
    state, (toks, confs) = jax.lax.scan(one_step, state, None,
                                        length=max_new_tokens)
    return jnp.swapaxes(toks, 0, 1), jnp.swapaxes(confs, 0, 1)


def transcribe_batch(params: dict, cfg: WhisperConfig, wave: Array,
                     prefix: Array, *, max_new_tokens: int = 32,
                     pad_to_seconds: Optional[float] = 30.0,
                     sample_rate: int = 16000) -> Tuple[Array, Array]:
    """End-to-end: [B, T] audio -> (token ids, confidences). Pads/trims to
    the Whisper 30 s window (the HF processor contract) unless
    pad_to_seconds=None keeps the input length (must still be even in
    frames)."""
    if pad_to_seconds is not None:
        T_target = int(pad_to_seconds * sample_rate)
        T = wave.shape[1]
        if T < T_target:
            wave = jnp.pad(wave, ((0, 0), (0, T_target - T)))
        else:
            wave = wave[:, :T_target]
    mel = log_mel_spectrogram(wave, n_mels=cfg.num_mel_bins)
    enc_out = encode(params, cfg, mel)
    return greedy_decode(params, cfg, enc_out, prefix,
                         max_new_tokens=max_new_tokens)

"""Int8 post-training quantization (ops/quant.py) correctness."""

import numpy as np
import jax
import jax.numpy as jnp

from multilingual_multimodal_speech_emotion_recognition_tpu.models import (
    layers, model as mdl)
from multilingual_multimodal_speech_emotion_recognition_tpu.ops import quant

from test_model import tiny_config

RNG = np.random.default_rng(5)


def test_linear_int8_close_to_float():
    p = layers.init_linear(jax.random.key(0), 256, 512)
    x = jnp.asarray(RNG.standard_normal((4, 10, 256)).astype(np.float32))
    want = np.asarray(layers.linear(p, x))
    got = np.asarray(layers.linear(quant.quantize_linear(p), x))
    # symmetric 8-bit: a few percent normalized RMS error on gaussian data
    nrmse = np.sqrt(((got - want) ** 2).mean()) / want.std()
    assert nrmse < 0.03, nrmse
    assert layers.linear(quant.quantize_linear(p), x).dtype == x.dtype


def test_quantize_stacked_kernels():
    L, I, O = 3, 64, 96
    w = RNG.standard_normal((L, I, O)).astype(np.float32)
    qp = quant.quantize_linear({"kernel": jnp.asarray(w)})
    assert qp["kernel_q"].shape == (L, I, O) and qp["kernel_q"].dtype == jnp.int8
    assert qp["w_scale"].shape == (L, O)
    # per-layer slice behaves like a regular quantized linear
    x = jnp.asarray(RNG.standard_normal((2, I)).astype(np.float32))
    sl = {"kernel_q": qp["kernel_q"][1], "w_scale": qp["w_scale"][1]}
    want = np.asarray(x @ w[1])
    got = np.asarray(layers.linear(sl, x))
    nrmse = np.sqrt(((got - want) ** 2).mean()) / want.std()
    assert nrmse < 0.03, nrmse


def test_cast_floating_preserves_scales():
    """bf16 serving must not round the f32 dequantization scales."""
    p = layers.init_linear(jax.random.key(0), 64, 64)
    qp = {"lin": quant.quantize_linear(p)}
    cast = mdl.cast_floating(qp, jnp.bfloat16)
    assert cast["lin"]["w_scale"].dtype == jnp.float32
    assert cast["lin"]["kernel_q"].dtype == jnp.int8
    assert cast["lin"]["bias"].dtype == jnp.bfloat16


def test_quantize_whisper_decodes():
    """Int8 Whisper: only the encoder/decoder matmul stacks quantize
    (convs / embeddings / norms stay float — the logits projection reads
    the tied embedding table), encode stays close to float, and the
    KV-cached greedy decode runs end to end."""
    from multilingual_multimodal_speech_emotion_recognition_tpu.models import (
        whisper as jw)
    cfg = jw.WhisperConfig(
        vocab_size=128, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=1500, max_target_positions=64,
        decoder_start_token_id=1, eos_token_id=2)
    params = jw.init_whisper(jax.random.key(0), cfg)
    qp = quant.quantize_whisper(params, min_size=16)
    assert "kernel_q" in qp["decoder"]["layers"]["self_attn"]["q"]
    assert "kernel_q" in qp["encoder"]["layers"]["ffn_in"]
    assert "kernel" in qp["encoder"]["conv1"]          # convs stay float
    assert qp["decoder"]["embed_tokens"].dtype != jnp.int8

    wave = jnp.asarray(RNG.standard_normal((2, 16000)).astype(np.float32)
                       * 0.1)
    mel = jw.log_mel_spectrogram(
        jnp.pad(wave, ((0, 0), (0, 30 * 16000 - wave.shape[1]))),
        n_mels=cfg.num_mel_bins)
    ref_enc = np.asarray(jw.encode(params, cfg, mel), np.float64)
    got_enc = np.asarray(jw.encode(qp, cfg, mel), np.float64)
    assert np.isfinite(got_enc).all()
    nrmse = np.sqrt(((got_enc - ref_enc) ** 2).mean()) / (ref_enc.std() + 1e-9)
    assert nrmse < 0.1, nrmse

    prefix = jnp.full((2, 1), cfg.decoder_start_token_id, jnp.int32)
    toks, confs = jw.transcribe_batch(qp, cfg, wave, prefix,
                                      max_new_tokens=6)
    assert toks.shape == (2, 6)
    confs = np.asarray(confs, np.float32)
    assert np.isfinite(confs).all() and (confs > 0).all()


def test_model_forward_quantized_backbones():
    cfg = tiny_config()
    params = mdl.init_model(jax.random.key(0), cfg)
    qparams = quant.quantize_backbones(params, min_size=16)

    # only backbone encoder layers are touched; heads bit-identical slots
    assert "kernel_q" in qparams["audio_backbone"]["layers"]["q"]
    assert "kernel_q" in qparams["text_backbone"]["layers"]["q"]
    assert "kernel" in qparams["classifier"]["input_proj"]

    B, T, S = 2, 3200, 8
    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.1),
        "audio_mask": jnp.ones((B, T), jnp.float32),
        "text_ids": jnp.asarray(rng.integers(2, cfg.text.vocab_size, (B, S))
                                .astype(np.int32)),
        "text_mask": jnp.ones((B, S), jnp.float32),
        "quality_feats": jnp.zeros((B, 8), jnp.float32),
        "cond_feats": jnp.zeros((B, 12), jnp.float32),
    }
    ref = mdl.model_forward(params, cfg, batch, deterministic=True)
    got = mdl.model_forward(qparams, cfg, batch, deterministic=True)
    ref_l = np.asarray(ref.logits, np.float64)
    got_l = np.asarray(got.logits, np.float64)
    assert np.isfinite(got_l).all()
    # quantization noise must not swamp the logit scale
    denom = np.abs(ref_l).mean() + 1e-6
    assert np.abs(got_l - ref_l).mean() / denom < 0.25, (got_l, ref_l)

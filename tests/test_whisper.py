"""TPU-native Whisper (models/whisper.py) parity vs transformers.

Random-weight from-config HF Whisper fixtures (zero egress — no
pretrained weights reachable; same policy as every converter suite):
  * log-mel features == WhisperFeatureExtractor's numpy pipeline
  * encoder states == WhisperModel.encoder on those features
  * teacher-forced decoder logits == WhisperForConditionalGeneration
  * jitted greedy_decode tokens + per-step max-prob confidences ==
    model.generate(do_sample=False, output_scores=True)
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from multilingual_multimodal_speech_emotion_recognition_tpu.models import (
    whisper as jw)

RNG = np.random.default_rng(17)

VOCAB, D, LAYERS, HEADS, FFN = 320, 32, 2, 4, 64
MAX_TGT = 64
START, EOS = 1, 2


@pytest.fixture(scope="module")
def hf_whisper():
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration
    torch.manual_seed(5)
    hf_cfg = HFConfig(
        vocab_size=VOCAB, num_mel_bins=80, d_model=D,
        encoder_layers=LAYERS, encoder_attention_heads=HEADS,
        decoder_layers=LAYERS, decoder_attention_heads=HEADS,
        encoder_ffn_dim=FFN, decoder_ffn_dim=FFN,
        max_source_positions=1500, max_target_positions=MAX_TGT,
        decoder_start_token_id=START, eos_token_id=EOS, pad_token_id=EOS,
        bos_token_id=START, suppress_tokens=[], begin_suppress_tokens=[],
        forced_decoder_ids=None, use_cache=True)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = jw.WhisperConfig(
        vocab_size=VOCAB, num_mel_bins=80, d_model=D,
        encoder_layers=LAYERS, encoder_attention_heads=HEADS,
        decoder_layers=LAYERS, decoder_attention_heads=HEADS,
        encoder_ffn_dim=FFN, decoder_ffn_dim=FFN,
        max_source_positions=1500, max_target_positions=MAX_TGT,
        decoder_start_token_id=START, eos_token_id=EOS)
    params = jw.params_from_hf(model.state_dict(), cfg)
    return model, cfg, params


def _audio(B=2, seconds=3.0):
    T = int(16000 * seconds)
    t = np.arange(T) / 16000
    x = np.stack([0.3 * np.sin(2 * np.pi * (220 + 80 * b) * t)
                  * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
                  for b in range(B)]).astype(np.float32)
    x += 0.01 * RNG.standard_normal(x.shape).astype(np.float32)
    return x


def _hf_features(x):
    from transformers import WhisperFeatureExtractor
    fe = WhisperFeatureExtractor(feature_size=80)
    return fe(list(x), sampling_rate=16000,
              return_tensors="np")["input_features"]


def test_log_mel_matches_whisper_feature_extractor():
    x = _audio()
    want = _hf_features(x)                               # [B, 80, 3000]
    T30 = 30 * 16000
    xp = np.pad(x, ((0, 0), (0, T30 - x.shape[1])))
    got = np.asarray(jw.log_mel_spectrogram(jnp.asarray(xp)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_encoder_matches_hf(hf_whisper):
    model, cfg, params = hf_whisper
    feats = _hf_features(_audio())
    with torch.no_grad():
        want = model.model.encoder(
            torch.from_numpy(feats)).last_hidden_state.numpy()
    got = np.asarray(jw.encode(params, cfg, jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_greedy_decode_matches_hf_generate(hf_whisper):
    model, cfg, params = hf_whisper
    feats = _hf_features(_audio())
    N = 12
    with torch.no_grad():
        out = model.generate(torch.from_numpy(feats), do_sample=False,
                             num_beams=1, max_new_tokens=N,
                             min_new_tokens=N, output_scores=True,
                             return_dict_in_generate=True)
    want_ids = out.sequences.numpy()                     # [B, 1+N]
    want_conf = np.stack(
        [torch.softmax(s, dim=-1).max(dim=-1).values.numpy()
         for s in out.scores], axis=1)                   # [B, N]

    prefix = jnp.full((feats.shape[0], 1), START, jnp.int32)
    enc_out = jw.encode(params, cfg, jnp.asarray(feats))
    toks, confs = jax.jit(
        lambda p, e, pre: jw.greedy_decode(p, cfg, e, pre,
                                           max_new_tokens=N))(
        params, enc_out, prefix)
    toks, confs = np.asarray(toks), np.asarray(confs)
    # HF emits [start, t1..tN]; ours emits [t1..tN]
    np.testing.assert_array_equal(toks, want_ids[:, 1:1 + N])
    np.testing.assert_allclose(confs, want_conf, rtol=2e-3, atol=2e-3)


def test_teacher_forced_prefix_matches_hf(hf_whisper):
    """Multi-token forced prefixes (language/task ids on real checkpoints)
    route through the same cached step — parity with HF decoder_input_ids."""
    model, cfg, params = hf_whisper
    feats = _hf_features(_audio())
    B = feats.shape[0]
    prefix_np = np.array([[START, 5, 9], [START, 5, 9]], np.int64)
    with torch.no_grad():
        logits = model(torch.from_numpy(feats),
                       decoder_input_ids=torch.from_numpy(prefix_np)
                       ).logits[:, -1]
        want_next = logits.argmax(-1).numpy()
    enc_out = jw.encode(params, cfg, jnp.asarray(feats))
    toks, _ = jw.greedy_decode(params, cfg, enc_out,
                               jnp.asarray(prefix_np, jnp.int32),
                               max_new_tokens=1)
    np.testing.assert_array_equal(np.asarray(toks)[:, 0], want_next)


def test_transcribe_batch_runs_end_to_end(hf_whisper):
    _, cfg, params = hf_whisper
    x = jnp.asarray(_audio(B=2, seconds=2.0))
    prefix = jnp.full((2, 1), START, jnp.int32)
    toks, confs = jw.transcribe_batch(params, cfg, x, prefix,
                                      max_new_tokens=8)
    assert toks.shape == (2, 8) and confs.shape == (2, 8)
    assert np.isfinite(np.asarray(confs)).all()
    assert (np.asarray(confs) > 0).all() and (np.asarray(confs) <= 1).all()


def test_transcribe_batch_bf16_params(hf_whisper):
    """The serving dtype: a bf16 param tree (how large-v3 is init'd on
    device — f32 params alone would be 6.2 GiB HBM) must decode; the f32
    log-mel is cast to the param dtype inside `encode` (the on-chip smoke
    caught the mismatch, scripts/tpu_asr_smoke.py)."""
    _, cfg, params = hf_whisper
    bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    x = jnp.asarray(_audio(B=2, seconds=2.0))
    prefix = jnp.full((2, 1), START, jnp.int32)
    toks, confs = jw.transcribe_batch(bf16, cfg, x, prefix,
                                      max_new_tokens=8)
    assert toks.shape == (2, 8)
    confs = np.asarray(confs, np.float32)
    assert np.isfinite(confs).all() and (confs > 0).all()


def test_jax_whisper_backend_in_asr_integration(hf_whisper):
    """JaxWhisperASR duck-types the torch backend: the full
    EnhancedASRIntegration pipeline (confidence grouping, calibration,
    alignment, the 8-dim feature vector) runs on the device decode."""
    from multilingual_multimodal_speech_emotion_recognition_tpu.frontend.asr import (
        EnhancedASRIntegration, JaxWhisperASR)
    model, cfg, params = hf_whisper
    backend = JaxWhisperASR.from_hf_model(model, max_new_tokens=6)
    assert backend.available
    integ = EnhancedASRIntegration(backend=backend)
    res = integ.process(_audio(B=1, seconds=1.0)[0])
    assert res.asr_features is not None and res.asr_features.shape == (8,)
    assert np.isfinite(res.asr_features).all()
    assert 0.0 <= res.overall_confidence <= 1.0

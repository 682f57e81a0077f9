"""Data-flow pipeline + integration checklist tests."""

import numpy as np
import jax
import pytest

from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
    Config, DataConfig, TrainConfig)
from multilingual_multimodal_speech_emotion_recognition_tpu import integration as integ
import multilingual_multimodal_speech_emotion_recognition_tpu.data.tokenizer as tok_lib
import multilingual_multimodal_speech_emotion_recognition_tpu.models.model as mdl

from test_model import tiny_config

SR = 16000


def test_segment_waveform():
    x = np.zeros(10 * SR, np.float32)
    segs = integ.segment_waveform(x, SR, segment_seconds=4.0, overlap=0.5)
    assert all(len(s) == 4 * SR for s in segs)
    assert len(segs) >= 4          # 50% overlap over 10 s
    short = np.zeros(SR, np.float32)
    assert len(integ.segment_waveform(short, SR)) == 1


def test_pipeline_process_segment():
    cfg = Config(model=tiny_config(),
                 data=DataConfig(max_text_tokens=12),
                 train=TrainConfig())
    params = mdl.init_model(jax.random.key(0), cfg.model)
    tok = tok_lib.HashTokenizer(vocab_size=100)
    pipe = integ.DataFlowPipeline(params, cfg, tokenizer=tok)
    t = np.arange(SR) / SR
    audio = (0.4 * np.sin(2 * np.pi * 400 * t)).astype(np.float32)
    res = pipe.process_audio_segment(audio, "the cat sat")
    assert res["probabilities"].shape == (4,)
    np.testing.assert_allclose(res["probabilities"].sum(), 1.0, atol=1e-6)
    assert 0 <= res["prediction"] < 4
    assert res["language"] == "en"
    names = [m.stage_name for m in res["stage_metrics"]]
    assert names == ["segmentation", "language_id", "tokenize",
                     "fused_model_forward", "ood_energy"]
    assert res["total_time"] > 0
    assert np.isfinite(res["energy_score"])

    # long-form path
    long_audio = np.tile(audio, 6)
    outs = pipe.process_long_audio(long_audio, "hello", segment_seconds=2.0)
    assert len(outs) >= 5


def test_streaming_recognizer():
    cfg = Config(model=tiny_config(),
                 data=DataConfig(max_text_tokens=12),
                 train=TrainConfig())
    params = mdl.init_model(jax.random.key(0), cfg.model)
    tok = tok_lib.HashTokenizer(vocab_size=100)
    rec = integ.StreamingRecognizer(params, cfg, tokenizer=tok,
                                    segment_seconds=1.0)
    t = np.arange(SR) / SR
    tone = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)

    # arbitrary chunk sizes: 0.4 s chunks complete a segment every ~3 pushes
    results = []
    for s in range(8):
        results += rec.push_audio(tone[: int(0.4 * SR)], text="hello there")
    assert len(results) == 3          # 3.2 s pushed -> 3 full 1 s segments
    tail = rec.flush(text="hello there")
    assert tail is not None and tail["segment_index"] == 3

    for r in results + [tail]:
        assert r["probabilities"].shape == (4,)
        np.testing.assert_allclose(r["probabilities"].sum(), 1.0, atol=1e-6)
        assert 0.0 <= r["confidence"] <= 1.0
        assert np.isfinite(r["smoothed_logits"]).all()
    # first segment can never flag a speaker change (no history)
    assert results[0]["speaker_changed"] is False
    assert [r["segment_index"] for r in results] == [0, 1, 2]

    # identical consecutive segments: projected cosine similarity ~1
    assert results[2]["speaker_similarity"] > 0.9

    # temporal smoothing engages once history exists: segments 1+ blend
    # current with buffered logits unless confidence > 0.9
    rec.reset()
    assert rec.segment_index == 0 and len(rec.push_audio(tone[:100])) == 0
    assert rec.flush() is not None and rec.flush() is None


def test_verify_integration():
    cfg = Config(model=tiny_config())
    params = mdl.init_model(jax.random.key(0), cfg.model)
    checks = integ.verify_integration(params, cfg)
    assert checks["all_passed"], checks
    # a broken tree is detected
    broken = {k: v for k, v in params.items() if k != "prototypes"}
    checks2 = integ.verify_integration(broken, cfg)
    assert not checks2["prototypes"] and not checks2["all_passed"]

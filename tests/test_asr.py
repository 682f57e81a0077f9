"""ASR integration tests (no Whisper weights needed: the backend degrades
gracefully, and the confidence/alignment/feature logic is deterministic)."""

import numpy as np
import pytest

from multilingual_multimodal_speech_emotion_recognition_tpu.frontend import asr

SR = 16000


def test_confidence_weighted_mask_thresholds():
    m = asr.confidence_weighted_mask([0.1, 0.4, 0.9])
    np.testing.assert_allclose(m, [0.0, 0.3, 1.0])
    np.testing.assert_allclose(asr.confidence_weighted_mask([]), [1.0])


def test_token_to_word_grouping():
    tokens = [" the", " qu", "ick", " fox"]
    confs = [0.9, 0.8, 0.6, 1.0]
    words = asr.group_token_confidences_to_words(tokens, confs)
    assert len(words) == 3
    np.testing.assert_allclose(words, [0.9, 0.7, 1.0])


def test_script_detection_and_code_switches():
    assert asr.detect_scripts("hello world") == ["en"]
    assert "ru" in asr.detect_scripts("привет hello")
    assert "hi" in asr.detect_scripts("नमस्ते")
    assert "bn" in asr.detect_scripts("বাংলা")
    sw = asr.detect_code_switches("hello привет world")
    assert len(sw) == 2
    assert sw[0]["from_language"] == "en" and sw[0]["to_language"] == "ru"
    assert asr.detect_code_switches("all english words") == []


def test_uniform_timestamps_and_phones():
    ts = asr.uniform_word_timestamps("ab cd", 2.0)
    np.testing.assert_allclose(ts, [(0.0, 1.0), (1.0, 2.0)])
    phones = asr.char_phone_alignment("ab cd", ts)
    assert len(phones) == 4
    assert phones[0]["phone"] == "a"
    assert phones[0]["end"] == pytest.approx(0.5)
    assert asr.uniform_word_timestamps("", 1.0) == []


def test_silence_regions():
    audio = np.zeros(SR, np.float32)
    t = np.arange(SR // 2) / SR
    audio[SR // 4:SR // 4 + SR // 2] = 0.5 * np.sin(2 * np.pi * 300 * t)
    regions = asr.silence_regions_rms(audio, SR)
    assert len(regions) >= 1
    # leading silence detected
    assert regions[0][0] == pytest.approx(0.0, abs=0.05)


def test_calibrator_identity_then_fit():
    c = asr.ConfidenceCalibrator()
    x = np.array([0.2, 0.5, 0.8])
    np.testing.assert_allclose(c.calibrate(x), x)
    conf = np.linspace(0, 1, 100)
    correct = (conf > 0.5).astype(float)
    c.fit(conf, correct)
    out = c.calibrate(np.array([0.1, 0.9]))
    assert out[0] < 0.5 < out[1]


def test_integration_with_provided_text():
    """With text supplied (the SER pipeline's normal path — ASR off by
    default, text from the manifest), no backend is touched."""
    integ = asr.EnhancedASRIntegration(backend=asr.WhisperASR("nonexistent"))
    audio = 0.1 * np.random.default_rng(0).standard_normal(SR).astype(np.float32)
    r = integ.process(audio, SR, text="the quick brown fox")
    assert r.text == "the quick brown fox"
    assert r.overall_confidence == 1.0
    assert len(r.word_timestamps) == 4
    assert r.asr_features.shape == (8,)
    assert r.asr_features[7] == 1.0  # has transcription
    np.testing.assert_allclose(r.attention_mask_weighted, np.ones(4))


def test_integration_no_backend_no_text():
    integ = asr.EnhancedASRIntegration(backend=asr.WhisperASR("nonexistent"))
    audio = np.zeros(SR, np.float32)
    r = integ.process(audio, SR)
    assert r.text == "" and r.overall_confidence == 0.0
    assert r.asr_features[7] == 0.0
    assert not integ.backend.available


def test_feature_vector_normalizations():
    r = asr.ASRResult(text="one two three", detected_languages=["en", "hi"],
                      code_switches=[{}] * 3,
                      silence_regions=[(0.0, 0.5)] * 2,
                      word_timestamps=[(0.0, 0.5), (0.5, 1.0), (1.0, 1.5)],
                      overall_confidence=0.8, text_reliability_score=0.7)
    f = asr.EnhancedASRIntegration.features(r)
    np.testing.assert_allclose(
        f, [0.8, 0.7, 2 / 5, 3 / 10, 2 / 20, 0.5, 3 / 50, 1.0], atol=1e-6)

"""langdetect shim: deterministic detect() so the reference's
LanguageIdentifier (quality_gates.py:249-304) takes its langdetect-present
path with the SAME language decisions as the native pipeline's detector
(frontend/lid.py:detect_language — script ranges + stop-word lists).
Both sides then run the reference's simulated 10-language distribution on
the same code, so LID entropy/confidence agree exactly. Raises
LangDetectException on undecidable text, like the real library."""

from __future__ import annotations


class LangDetectException(Exception):
    pass


def detect(text: str) -> str:
    from multilingual_multimodal_speech_emotion_recognition_tpu.frontend.lid import (
        detect_language)
    lang = detect_language(text)
    if lang is None:
        raise LangDetectException(f"cannot detect language: {text!r}")
    return lang

"""Signal-processing front-end: quality gates, conditioning, language ID.

Device-side batched replacements for the reference's per-sample host
pipeline (/root/reference/src/models/quality_gates.py,
audio_conditioning.py). `frontend_process` chains gates → conditioning the
way AudioEncoder does (/root/reference/src/models/audio_encoder.py:65-88)
and returns everything the model needs in one jittable call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import asr, conditioning, lid, quality_gates, spectral
from .asr import ASRResult, EnhancedASRIntegration, create_enhanced_asr
from .conditioning import (NOISE_TYPES, ConditioningStats, condition_audio,
                           conditioning_report, detect_noise_type)
from .lid import batch_lid, identify_language
from .quality_gates import QualityStats, quality_gates as run_quality_gates

__all__ = [
    "ASRResult", "ConditioningStats", "EnhancedASRIntegration",
    "NOISE_TYPES", "QualityStats", "asr", "batch_lid", "condition_audio",
    "conditioning", "conditioning_report", "create_enhanced_asr",
    "detect_noise_type", "frontend_process", "identify_language", "lid",
    "quality_gates", "run_quality_gates", "spectral",
]


@functools.partial(jax.jit, static_argnames=("sample_rate", "use_gates",
                                             "use_conditioning",
                                             "zero_non_accept"))
def frontend_process(wave: jax.Array, mask: jax.Array, *,
                     lid_entropy: jax.Array, lid_confidence: jax.Array,
                     sample_rate: int = 16000, use_gates: bool = True,
                     use_conditioning: bool = True,
                     zero_non_accept: bool = False):
    """Gates then conditioning (audio_encoder.py:65-88 order). Returns
    (processed_wave, quality_feats [B,8], cond_feats [B,12], stats dict).
    zero_non_accept replicates the reference encoder's zeroing of
    non-'accept' clips (audio_encoder.py:74-77; conditioning then runs on
    the zeroed audio, exactly as there)."""
    B = wave.shape[0]
    q_feats = jnp.zeros((B, 8), wave.dtype)
    c_feats = jnp.zeros((B, 12), wave.dtype)
    stats = {}
    if use_gates:
        wave, q = run_quality_gates(wave, mask, lid_entropy=lid_entropy,
                                    lid_confidence=lid_confidence,
                                    sample_rate=sample_rate,
                                    zero_non_accept=zero_non_accept)
        q_feats, stats["quality"] = q.features, q
    if use_conditioning:
        wave, c = condition_audio(wave, mask, sample_rate=sample_rate)
        c_feats, stats["conditioning"] = c.features, c
    return wave, q_feats, c_feats, stats

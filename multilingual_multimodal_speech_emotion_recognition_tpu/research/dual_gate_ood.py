"""Dual-gate OOD detection: quality-based early gate + energy ⊕
Mahalanobis late gate with adaptive per-(language × SNR-band) thresholds.

Parity with /root/reference/src/models/dual_gate_ood.py:
  * OODReason taxonomy (:18-31)
  * EarlyOODDetector thresholds — SNR<5, clipping>30, speech<0.4,
    LID-entropy>2, lang-conf<0.3, music>0.5, laughter>0.6,
    denoise-gain>15 dB (:66-184), vectorized
  * EnergyBasedOODDetector: E = −logsumexp(logits/T); temperature grid
    0.1..10 over 100 points minimizing energy-score std (:187-243)
  * PrototypeDistanceOODDetector: diagonal Mahalanobis to per-class
    prototypes; update_prototypes = class means/vars (:246-328) — the
    reference's per-class python loop becomes one einsum
  * LateStageOODDetector: softmax-combined sigmoid(−E) ⊕ exp(−min_dist)
    with learnable weights init (0.6, 0.4), threshold 0.5 (:331-412)
  * AdaptiveThresholdManager: per-(language, SNR-band) learnable table,
    bands (−inf,10)(10,20)(20,inf), global fallback when the specific
    threshold leaves [0.1, 0.9] (:415-489)
  * outlier-exposure objective: CE(in) + 0.5·uniform-KL(outliers) (:604-626)
"""

from __future__ import annotations

import enum
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class OODReason(enum.IntEnum):
    NONE = 0
    LOW_SNR = 1
    HIGH_CLIPPING = 2
    LOW_SPEECH_PROB = 3
    HIGH_LID_ENTROPY = 4
    LOW_LANGUAGE_CONF = 5
    HIGH_MUSIC_PROB = 6
    HIGH_LAUGHTER_PROB = 7
    EXCESSIVE_CONDITIONING = 8
    HIGH_ENERGY = 9
    HIGH_PROTOTYPE_DISTANCE = 10
    COMBINED_THRESHOLD = 11


# early-gate thresholds (dual_gate_ood.py:75-99)
EARLY_THRESHOLDS = dict(snr=5.0, clipping=30.0, speech_prob=0.4,
                        lid_entropy=2.0, language_conf=0.3, music=0.5,
                        laughter=0.6, conditioning_gain=15.0)

SNR_BANDS = ((-float("inf"), 10.0), (10.0, 20.0), (20.0, float("inf")))
NUM_LANGUAGES = 7


class EarlyOODResult(NamedTuple):
    is_ood: Array            # [B] bool
    reason: Array            # [B] int32 (OODReason)
    confidence_score: Array  # [B]


def early_ood(quality: Dict[str, Array]) -> EarlyOODResult:
    """Vectorized early gate (dual_gate_ood.py:103-184). `quality` maps
    metric name -> [B] array; missing metrics assume benign defaults."""
    def get(name, default):
        v = quality.get(name)
        return v if v is not None else jnp.full_like(
            next(iter(quality.values())), default)

    snr = get("snr_db", 20.0)
    clip = get("clipping_percent", 0.0)
    speech = get("speech_prob", 1.0)
    ent = get("lid_entropy", 0.0)
    lconf = get("language_conf", 1.0)
    music = get("music_prob", 0.0)
    laugh = get("laughter_prob", 0.0)
    dgain = get("denoise_gain_db", 0.0)

    t = EARLY_THRESHOLDS
    checks = [
        (snr < t["snr"], OODReason.LOW_SNR),
        (clip > t["clipping"], OODReason.HIGH_CLIPPING),
        (speech < t["speech_prob"], OODReason.LOW_SPEECH_PROB),
        (ent > t["lid_entropy"], OODReason.HIGH_LID_ENTROPY),
        (lconf < t["language_conf"], OODReason.LOW_LANGUAGE_CONF),
        (music > t["music"], OODReason.HIGH_MUSIC_PROB),
        (laugh > t["laughter"], OODReason.HIGH_LAUGHTER_PROB),
        (dgain > t["conditioning_gain"], OODReason.EXCESSIVE_CONDITIONING),
    ]
    is_ood = jnp.zeros_like(snr, dtype=bool)
    reason = jnp.zeros_like(snr, dtype=jnp.int32)
    # first-match-wins priority order, like the reference's elif chain
    for cond, r in reversed(checks):
        reason = jnp.where(cond, jnp.int32(int(r)), reason)
        is_ood = is_ood | cond
    # confidence = normalized margin from the nearest threshold
    conf = jnp.clip(jnp.minimum(snr / (2 * t["snr"]), speech), 0.0, 1.0)
    conf = jnp.where(is_ood, 1.0 - conf, conf)
    return EarlyOODResult(is_ood=is_ood, reason=reason, confidence_score=conf)


# ------------------------------------------------------------ energy gate

def energy_scores(logits: Array, temperature: Array | float = 1.0) -> Array:
    """E(x) = −logsumexp(logits / T) (dual_gate_ood.py:213-220)."""
    return -jax.nn.logsumexp(logits / temperature, axis=-1)


def calibrate_energy_temperature(val_logits: Array) -> float:
    """Grid search T ∈ linspace(0.1, 10, 100) minimizing std of the energy
    scores (dual_gate_ood.py:222-243), vectorized over the grid."""
    temps = jnp.linspace(0.1, 10.0, 100)
    stds = jax.vmap(lambda t: energy_scores(val_logits, t).std())(temps)
    return float(temps[jnp.argmin(stds)])


# --------------------------------------------------------- prototype gate

def init_prototype_detector(key: Array, num_classes: int,
                            feature_dim: int) -> dict:
    from ..models import layers
    return {"prototypes": layers.xavier_uniform(key, (num_classes, feature_dim)),
            "covariances": jnp.ones((num_classes, feature_dim))}


def prototype_distances(params: dict, features: Array) -> Tuple[Array, Array]:
    """Diagonal Mahalanobis distance to each class prototype
    (dual_gate_ood.py:280-310 without the per-class loop).
    Returns (distances [B, C], min_distances [B])."""
    diff = features[:, None, :] - params["prototypes"][None]       # [B, C, D]
    inv_cov = 1.0 / (params["covariances"] + 1e-8)                 # [C, D]
    d = jnp.sqrt((diff * diff * inv_cov[None]).sum(-1))
    return d, d.min(-1)


def update_prototypes(params: dict, features: Array, labels: Array,
                      num_classes: int) -> dict:
    """Class means/vars from labeled features (dual_gate_ood.py:312-328)."""
    onehot = jax.nn.one_hot(labels, num_classes, dtype=features.dtype)  # [B,C]
    counts = onehot.sum(0)[:, None]                                     # [C,1]
    means = (onehot.T @ features) / jnp.maximum(counts, 1.0)
    sq = (onehot.T @ (features ** 2)) / jnp.maximum(counts, 1.0)
    var = jnp.maximum(sq - means ** 2, 0.0) * counts / jnp.maximum(counts - 1, 1.0)
    has = counts > 0
    return {"prototypes": jnp.where(has, means, params["prototypes"]),
            "covariances": jnp.where(has, var + 1e-8, params["covariances"])}


# --------------------------------------------------------------- late gate

class LateOODResult(NamedTuple):
    is_ood: Array             # [B] bool
    energy_score: Array       # [B]
    prototype_distance: Array  # [B]
    combined_score: Array     # [B]
    reason: Array             # [B] int32


def init_late_detector(key: Array, num_classes: int, feature_dim: int,
                       energy_weight: float = 0.6,
                       prototype_weight: float = 0.4) -> dict:
    return {"prototype": init_prototype_detector(key, num_classes, feature_dim),
            "combination_weights": jnp.asarray([energy_weight, prototype_weight]),
            "temperature": jnp.asarray(1.0)}


def late_ood(params: dict, logits: Array, features: Array, *,
             threshold: Array | float = 0.5) -> LateOODResult:
    """Combined energy ⊕ prototype gate (dual_gate_ood.py:360-412)."""
    e = energy_scores(logits, params["temperature"])
    _, min_d = prototype_distances(params["prototype"], features)
    e_norm = jax.nn.sigmoid(-e)
    d_norm = jnp.exp(-min_d)
    w = jax.nn.softmax(params["combination_weights"])
    combined = w[0] * e_norm + w[1] * d_norm
    is_ood = combined < threshold
    reason = jnp.where(
        e_norm < 0.3, jnp.int32(int(OODReason.HIGH_ENERGY)),
        jnp.where(d_norm < 0.3, jnp.int32(int(OODReason.HIGH_PROTOTYPE_DISTANCE)),
                  jnp.int32(int(OODReason.COMBINED_THRESHOLD))))
    return LateOODResult(is_ood=is_ood, energy_score=e,
                         prototype_distance=min_d, combined_score=combined,
                         reason=reason)


# ------------------------------------------------------ adaptive thresholds

def init_threshold_manager(num_languages: int = NUM_LANGUAGES) -> dict:
    return {"thresholds": jnp.full((num_languages, len(SNR_BANDS)), 0.5),
            "global_threshold": jnp.asarray(0.5)}


def snr_band_index(snr_db: Array) -> Array:
    idx = jnp.zeros_like(snr_db, dtype=jnp.int32)
    for i, (low, high) in enumerate(SNR_BANDS):
        idx = jnp.where((snr_db >= low) & (snr_db < high), i, idx)
    return idx


def get_threshold(params: dict, language_id: Array, snr_db: Array) -> Array:
    """Per-sample adaptive threshold with the reference's extreme-value
    fallback to the global threshold (dual_gate_ood.py:443-467)."""
    lang = jnp.clip(language_id, 0, params["thresholds"].shape[0] - 1)
    band = snr_band_index(snr_db)
    specific = params["thresholds"][lang, band]
    extreme = (specific < 0.1) | (specific > 0.9)
    return jnp.where(extreme, params["global_threshold"], specific)


# ---------------------------------------------------------- dual-gate flow

class DualGateResult(NamedTuple):
    is_ood: Array                 # [B] bool
    stage: Array                  # [B] int32: 0 early, 1 late
    confidence_score: Array       # [B]
    reason: Array                 # [B] int32
    computational_savings: Array  # [B] bool (early short-circuit)


def dual_gate_ood(late_params: dict, threshold_params: dict,
                  quality: Dict[str, Array], logits: Array, features: Array,
                  *, language_id: Optional[Array] = None) -> DualGateResult:
    """Early gate short-circuit → late gate with adaptive threshold
    (dual_gate_ood.py:520-602). Functional: both gates evaluate (XLA has no
    data-dependent early exit) but early hits mask out the late verdict —
    the 'computational savings' survive as a batch statistic."""
    early = early_ood(quality)
    snr = quality.get("snr_db")
    if snr is None:
        snr = jnp.full(logits.shape[:1], 20.0)
    if language_id is None:
        language_id = jnp.zeros(logits.shape[:1], jnp.int32)
    thr = get_threshold(threshold_params, language_id, snr)
    late = late_ood(late_params, logits, features, threshold=thr)

    is_ood = jnp.where(early.is_ood, True, late.is_ood)
    stage = jnp.where(early.is_ood, 0, 1).astype(jnp.int32)
    reason = jnp.where(early.is_ood, early.reason, late.reason)
    conf = jnp.where(early.is_ood, early.confidence_score,
                     late.combined_score)
    return DualGateResult(is_ood=is_ood, stage=stage, confidence_score=conf,
                          reason=reason, computational_savings=early.is_ood)


def outlier_exposure_loss(in_logits: Array, in_labels: Array,
                          outlier_logits: Array) -> Array:
    """CE on in-domain + 0.5 · KL(uniform ‖ softmax) on outliers
    (dual_gate_ood.py:604-626 intent: outliers should be maximally
    uncertain)."""
    logp = jax.nn.log_softmax(in_logits)
    ce = -jnp.take_along_axis(logp, in_labels[:, None], axis=1).mean()
    out_logp = jax.nn.log_softmax(outlier_logits)
    uniform_ce = -out_logp.mean()
    return ce + 0.5 * uniform_ce

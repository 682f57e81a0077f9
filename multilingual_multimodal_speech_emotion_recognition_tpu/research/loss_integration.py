"""Comprehensive loss integration: 3-phase weight scheduling, energy-margin,
temporal-consistency and confidence-calibration losses, batch validation.

Parity with /root/reference/src/models/comprehensive_loss_integration.py:
  * TrainingPhase {representation @0, adversarial @50, calibration @100
    epochs} and LossWeights (CE 1.0, SupCon 0.25, proto 0.3, lang-adv −0.1,
    energy-margin 0.15, temporal 0.2, calib 0.1) with phase masking
    (:22-102, :590-659)
  * EnergyMarginLoss: mean relu(E) on in-domain + mean relu(margin − E) on
    OOD, margin 10 (:105-158) — masked reductions instead of boolean
    indexing (fixed shapes under jit)
  * TemporalConsistencyLoss: KL(current ‖ previous) only where
    min(conf_cur, conf_prev) < 0.8 (:161-215)
  * ConfidenceCalibrationLoss: 10-bin squared (conf − acc) (:218-271);
    differentiable in the bin-mean sense like the reference
  * BatchCompositionValidator warn-only rules: batch ≥ 32, OOD ratio ≥ 0.2,
    ≥ 2 languages, ≥ 2 emotion classes (:274-358)
  * ComprehensiveLossIntegration.compute_total (:361-587) — unlike the
    reference's train_two_phase.py:325 (calls a method that doesn't exist),
    this integration is exercised by tests
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

PHASES = ("representation_learning", "adversarial_training", "calibration")
PHASE_EPOCHS = {"representation_learning": 0, "adversarial_training": 50,
                "calibration": 100}


@dataclasses.dataclass(frozen=True)
class LossWeights:
    ce_loss: float = 1.0
    supcon_loss: float = 0.25
    prototype_loss: float = 0.3
    language_adversarial_loss: float = -0.1
    energy_margin_loss: float = 0.15
    temporal_consistency_loss: float = 0.2
    confidence_calibration_loss: float = 0.1

    def phase_weights(self, phase: str) -> Dict[str, float]:
        base = dataclasses.asdict(self)
        if phase == "representation_learning":
            off = ("language_adversarial_loss", "energy_margin_loss",
                   "temporal_consistency_loss", "confidence_calibration_loss")
        elif phase == "adversarial_training":
            off = ("temporal_consistency_loss", "confidence_calibration_loss")
        elif phase == "calibration":
            off = ()
        else:
            raise ValueError(f"unknown phase {phase!r}")
        return {k: (0.0 if k in off else v) for k, v in base.items()}


def phase_for_epoch(epoch: int) -> str:
    """Phase schedule (:590-659): representation @0, adversarial @50,
    calibration @100."""
    if epoch >= PHASE_EPOCHS["calibration"]:
        return "calibration"
    if epoch >= PHASE_EPOCHS["adversarial_training"]:
        return "adversarial_training"
    return "representation_learning"


# ------------------------------------------------------------------ losses

def energy_margin_loss(logits: Array, is_ood: Array, *, margin: float = 10.0,
                       temperature: float = 1.0) -> Array:
    """relu(E) for in-domain + relu(margin − E) for OOD (:122-158)."""
    e = -jax.nn.logsumexp(logits / temperature, axis=-1)
    in_mask = (~is_ood).astype(e.dtype)
    ood_mask = is_ood.astype(e.dtype)
    n_in = in_mask.sum()
    n_ood = ood_mask.sum()
    in_loss = jnp.where(n_in > 0,
                        (jax.nn.relu(e) * in_mask).sum() / jnp.maximum(n_in, 1.0),
                        0.0)
    ood_loss = jnp.where(n_ood > 0,
                         (jax.nn.relu(margin - e) * ood_mask).sum()
                         / jnp.maximum(n_ood, 1.0), 0.0)
    return in_loss + ood_loss


def temporal_consistency_loss(current_logits: Array, previous_logits: Array,
                              current_conf: Array, previous_conf: Array,
                              *, confidence_threshold: float = 0.8) -> Array:
    """KL(current ‖ previous) applied only where min(conf) < threshold
    (:178-215)."""
    cur_logp = jax.nn.log_softmax(current_logits)
    prev_p = jax.nn.softmax(previous_logits)
    kl = (jnp.exp(cur_logp) * (cur_logp - jnp.log(prev_p + 1e-8))).sum(-1)
    apply = jnp.minimum(current_conf, previous_conf) < confidence_threshold
    m = apply.astype(kl.dtype)
    n = m.sum()
    return jnp.where(n > 0, (kl * m).sum() / jnp.maximum(n, 1.0), 0.0)


def confidence_calibration_loss(predicted_confidence: Array,
                                correct: Array, *, num_bins: int = 10,
                                weight: float = 1.0) -> Array:
    """Σ_bins (mean_conf − mean_acc)² / num_bins (:237-271)."""
    edges = jnp.linspace(0.0, 1.0, num_bins + 1)
    acc = correct.astype(predicted_confidence.dtype)
    err = jnp.zeros(())
    for b in range(num_bins):
        in_bin = ((predicted_confidence > edges[b])
                  & (predicted_confidence <= edges[b + 1])).astype(acc.dtype)
        n = in_bin.sum()
        bin_conf = (predicted_confidence * in_bin).sum() / jnp.maximum(n, 1.0)
        bin_acc = (acc * in_bin).sum() / jnp.maximum(n, 1.0)
        err = err + jnp.where(n > 0, (bin_conf - bin_acc) ** 2, 0.0)
    return weight * err / num_bins


# ---------------------------------------------------------- batch validator

def validate_batch_composition(labels: np.ndarray,
                               language_ids: Optional[np.ndarray] = None,
                               is_ood: Optional[np.ndarray] = None,
                               *, min_batch: int = 32,
                               min_ood_ratio: float = 0.2,
                               min_languages: int = 2,
                               min_classes: int = 2) -> Dict:
    """Warn-only composition checks (:274-358). Returns a report dict."""
    labels = np.asarray(labels)
    warnings = []
    if len(labels) < min_batch:
        warnings.append(f"batch size {len(labels)} < {min_batch}")
    if is_ood is not None:
        ratio = float(np.asarray(is_ood).mean())
        if ratio < min_ood_ratio:
            warnings.append(f"OOD ratio {ratio:.2f} < {min_ood_ratio}")
    if language_ids is not None:
        n_lang = len(np.unique(language_ids))
        if n_lang < min_languages:
            warnings.append(f"{n_lang} languages < {min_languages}")
    n_cls = len(np.unique(labels))
    if n_cls < min_classes:
        warnings.append(f"{n_cls} emotion classes < {min_classes}")
    return {"valid": not warnings, "warnings": warnings,
            "batch_size": int(len(labels)), "num_classes": int(n_cls)}


# ------------------------------------------------------------- integration

def compute_total_loss(components: Dict[str, Array], epoch: int,
                       weights: Optional[LossWeights] = None
                       ) -> Dict[str, Array]:
    """Phase-weighted sum over whatever components are supplied; missing
    components contribute 0 (the reference stubs lang-adv/temporal with
    random/zero tensors at :520-546 — here absent means absent)."""
    weights = weights or LossWeights()
    phase = phase_for_epoch(epoch)
    w = weights.phase_weights(phase)
    total = jnp.zeros(())
    out: Dict[str, Array] = {}
    for name, weight in w.items():
        comp = components.get(name)
        if comp is None or weight == 0.0:
            out[name] = jnp.zeros(())
            continue
        out[name] = comp
        total = total + weight * comp
    out["total_loss"] = total
    out["phase"] = phase
    return out

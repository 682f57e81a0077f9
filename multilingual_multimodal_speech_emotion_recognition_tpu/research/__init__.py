"""Research-halo modules (SURVEY.md §2.4): independently tested functional
rewrites of the reference's partially-integrated research components.

confidence_fusion — 14-dim confidence gating + policy clamps + adaptive fusion
temporal          — PE, causal TCN, smoothing, speaker change, segment buffer
cross_lingual     — GRL adversarial head, adapters, consistency loss
dual_gate_ood     — early quality gate + energy ⊕ Mahalanobis late gate
loss_integration  — 3-phase loss scheduling, energy-margin/temporal/calib losses
"""

from . import (confidence_fusion, cross_lingual, dual_gate_ood,
               loss_integration, temporal)

__all__ = ["confidence_fusion", "cross_lingual", "dual_gate_ood",
           "loss_integration", "temporal"]

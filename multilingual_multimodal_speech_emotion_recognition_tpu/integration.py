"""Staged data-flow orchestration with per-stage metrics.

Working replacement for the reference's aspirational
/root/reference/src/integration/data_flow_architecture.py (790 LoC, never
imported by train/eval; its classification stage returns random logits at
:447-460 and its IntegrationChecklist probes attribute names that don't
exist on the real classes, :550-716). Here the same 12-stage contract —
segmentation → quality gates → abstain → conditioning → audio features →
ASR → text features → cross-attention → confidence fusion → temporal →
cross-lingual → classification+OOD — runs against the REAL framework
components, with per-stage wall-clock/metadata captured in
ProcessingMetrics, and `verify_integration` checks the actual API surface.

Note the TPU-first difference: stages 4-12 are one jitted model_forward —
the per-stage timing separates host-side stages (segmentation, LID, ASR)
from the fused device program rather than pretending the fused graph has
observable internal boundaries.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .data.tokenizer import Tokenizer, get_tokenizer
from .frontend import lid as lid_mod
from .models import model as mdl
from .research import dual_gate_ood as dg


@dataclasses.dataclass
class ProcessingMetrics:
    """Per-stage timing + metadata (data_flow_architecture.py:81-90)."""
    stage_name: str
    processing_time: float
    success: bool = True
    metadata: Dict = dataclasses.field(default_factory=dict)


def segment_waveform(wave: np.ndarray, sr: int = 16000, *,
                     segment_seconds: float = 4.0,
                     overlap: float = 0.5) -> List[np.ndarray]:
    """Sliding-window segmentation for long-form audio (stage 1), feeding
    the temporal module's 3-segment buffer (research/temporal.py)."""
    seg = int(segment_seconds * sr)
    hop = max(int(seg * (1.0 - overlap)), 1)
    if len(wave) <= seg:
        return [wave]
    out = []
    for start in range(0, len(wave) - seg + 1, hop):
        out.append(wave[start:start + seg])
    if (len(wave) - seg) % hop:
        out.append(wave[-seg:])
    return out


class DataFlowPipeline:
    """End-to-end staged processing over real components."""

    def __init__(self, params, cfg: Config,
                 tokenizer: Optional[Tokenizer] = None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer or get_tokenizer(
            vocab_size=cfg.model.text.vocab_size)
        self._metrics: List[ProcessingMetrics] = []

        model_cfg = cfg.model

        @jax.jit
        def fwd(params, batch):
            out = mdl.model_forward(params, model_cfg, batch,
                                    deterministic=True, use_openmax=True)
            return out.logits, out.uncertainty, out.features

        self._fwd = fwd

    def _record(self, name: str, t0: float, **meta) -> None:
        self._metrics.append(ProcessingMetrics(
            stage_name=name, processing_time=time.perf_counter() - t0,
            metadata=meta))

    def process_audio_segment(self, audio: np.ndarray, text: str = "", *,
                              sr: int = 16000) -> Dict:
        """One segment through the full flow. Returns predictions + stage
        metrics (data_flow_architecture.py:222-437 contract)."""
        self._metrics = []

        # stage 1: segmentation bookkeeping (single segment here)
        t0 = time.perf_counter()
        max_t = int(self.cfg.data.max_audio_seconds * sr)
        audio = np.asarray(audio, np.float32)[:max_t]
        self._record("segmentation", t0, samples=len(audio))

        # stage 2: language ID (host, text side of the gates)
        t0 = time.perf_counter()
        ent, lang, conf = lid_mod.identify_language(text)
        self._record("language_id", t0, language=lang, entropy=ent)

        # stage 3: tokenize (host)
        t0 = time.perf_counter()
        ids, tmask = self.tokenizer.encode_batch(
            [text], self.cfg.data.max_text_tokens)
        self._record("tokenize", t0, tokens=int(tmask.sum()))

        # stages 4-12 fused on device: gates -> conditioning -> encoders ->
        # cross-attention -> pooling -> fusion -> classifier (+OpenMax)
        t0 = time.perf_counter()
        wave = jnp.asarray(audio)[None, :]
        batch = {
            "audio": wave,
            "audio_mask": jnp.ones_like(wave),
            "text_ids": jnp.asarray(ids),
            "text_mask": jnp.asarray(tmask),
            "lid_entropy": jnp.asarray([ent], jnp.float32),
            "lid_conf": jnp.asarray([conf], jnp.float32),
        }
        logits, uncertainty, features = self._fwd(self.params, batch)
        logits = np.asarray(logits, np.float64)
        self._record("fused_model_forward", t0)

        # stage 12b: late OOD signal (energy score on the real logits)
        t0 = time.perf_counter()
        energy = float(-jax.nn.logsumexp(jnp.asarray(logits[0])))
        self._record("ood_energy", t0, energy=energy)

        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs = e / e.sum(axis=1, keepdims=True)
        return {
            "logits": logits[0],
            "probabilities": probs[0],
            "prediction": int(logits[0].argmax()),
            "uncertainty": float(np.asarray(uncertainty)[0, 0]),
            "energy_score": energy,
            "language": lang,
            "stage_metrics": list(self._metrics),
            "total_time": sum(m.processing_time for m in self._metrics),
        }

    def process_long_audio(self, audio: np.ndarray, text: str = "", *,
                           sr: int = 16000,
                           segment_seconds: float = 4.0) -> List[Dict]:
        """Segment long audio and process each window (stages 1→12 per
        segment); downstream temporal smoothing consumes these."""
        return [self.process_audio_segment(seg, text, sr=sr)
                for seg in segment_waveform(audio, sr,
                                            segment_seconds=segment_seconds)]


def verify_integration(params, cfg: Config) -> Dict[str, bool]:
    """Component-presence verification against the REAL parameter tree and
    API (unlike the reference's hasattr probes of nonexistent attrs,
    data_flow_architecture.py:550-716)."""
    checks = {}
    p = params
    checks["audio_encoder"] = "audio_backbone" in p and "convs" in p["audio_backbone"]
    checks["text_encoder"] = "text_backbone" in p
    checks["adapters"] = "audio_adapter" in p and "text_adapter" in p
    checks["cross_modal_attention"] = "cross" in p
    checks["pooling"] = "pool_a" in p and "pool_t" in p
    checks["fusion"] = "fusion" in p
    checks["classifier"] = ("classifier" in p
                            and "layers" in p["classifier"]
                            and "anchor" in p["classifier"]
                            and "uncertainty" in p["classifier"])
    checks["openmax_weibull"] = "weibull" in p.get("classifier", {})
    checks["prototypes"] = "prototypes" in p
    checks["frontend_feature_fusion"] = any(
        k in p for k in ("combined_fusion", "quality_fusion",
                         "conditioning_fusion"))
    checks["quality_gates_flag"] = isinstance(cfg.model.use_quality_gates, bool)
    checks["dual_gate_ood_available"] = callable(dg.dual_gate_ood)
    checks["all_passed"] = all(v for k, v in checks.items())
    return checks

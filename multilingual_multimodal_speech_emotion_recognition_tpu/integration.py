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


class StreamingRecognizer:
    """Real-time chunked recognition with temporal smoothing.

    TPU-native streaming surface over the temporal module
    (research/temporal.py): audio arrives in arbitrary-size chunks; every
    full `segment_seconds` window runs ONE jitted fused forward (fixed
    segment shape — one compile for the whole stream) producing the
    classifier's 256-d penultimate features, then the jitted temporal step
    (buffer push → positional encoding → causal TCN over the 3-segment
    window → confidence smoothing → speaker-change detection) carries
    `TemporalBufferState` across segments. This realizes the reference's
    stateful segment pipeline — TemporalModelingModule + deque buffer
    (temporal_modeling.py:365-615) driven per-segment by
    data_flow_architecture.py:222-437 stage 10 — as an explicit functional
    carry instead of module state.

    `temporal_params` defaults to a fresh init (the reference never trains
    its temporal module in a default path either; train_two_phase is where
    both would learn it). `push_audio` returns one result dict per
    completed segment; `flush` drains the tail (zero-padded, masked).
    """

    def __init__(self, params, cfg: Config, *,
                 temporal_params: Optional[dict] = None,
                 segment_seconds: float = 4.0, sr: int = 16000,
                 tokenizer: Optional[Tokenizer] = None, seed: int = 0):
        from .research import temporal as tm
        self.params = params
        self.cfg = cfg
        self.sr = sr
        self.segment_len = int(segment_seconds * sr)
        self.tokenizer = tokenizer or get_tokenizer(
            vocab_size=cfg.model.text.vocab_size)
        feature_dim = cfg.model.classifier_base_dim // 2
        self.temporal_params = temporal_params or tm.init_temporal_module(
            jax.random.key(seed), feature_dim=feature_dim,
            num_emotions=cfg.model.num_labels)
        self._tm = tm
        model_cfg = cfg.model

        @jax.jit
        def fwd(params, batch):
            out = mdl.model_forward(params, model_cfg, batch,
                                    deterministic=True, use_openmax=True)
            probs = jax.nn.softmax(out.logits.astype(jnp.float32), axis=-1)
            return (out.logits, out.uncertainty,
                    out.features.astype(jnp.float32),
                    probs.max(axis=-1, keepdims=True))

        self._fwd = fwd
        self._step = jax.jit(lambda p, s, f, c: tm.temporal_step(p, s, f, c))
        self.reset()

    def reset(self) -> None:
        self.state = self._tm.init_buffer(
            1, self.cfg.model.classifier_base_dim // 2)
        self._pending = np.zeros(0, np.float32)
        self.segment_index = 0

    def push_audio(self, samples: np.ndarray, text: str = "") -> List[Dict]:
        """Feed a chunk of any length; returns results for every segment
        completed by it (possibly empty — state accumulates)."""
        self._pending = np.concatenate(
            [self._pending, np.asarray(samples, np.float32).reshape(-1)])
        out = []
        while len(self._pending) >= self.segment_len:
            seg, self._pending = (self._pending[: self.segment_len],
                                  self._pending[self.segment_len:])
            out.append(self._process(seg, self.segment_len, text))
        return out

    def flush(self, text: str = "") -> Optional[Dict]:
        """Process the residual tail (< one segment), zero-padded + masked."""
        n = len(self._pending)
        if n == 0:
            return None
        seg = np.zeros(self.segment_len, np.float32)
        seg[:n] = self._pending
        self._pending = np.zeros(0, np.float32)
        return self._process(seg, n, text)

    def _process(self, seg: np.ndarray, valid: int, text: str) -> Dict:
        ent, lang, conf = lid_mod.identify_language(text)
        ids, tmask = self.tokenizer.encode_batch(
            [text], self.cfg.data.max_text_tokens)
        mask = np.zeros_like(seg)
        mask[: max(valid, 1)] = 1.0
        batch = {
            "audio": jnp.asarray(seg)[None],
            "audio_mask": jnp.asarray(mask)[None],
            "text_ids": jnp.asarray(ids),
            "text_mask": jnp.asarray(tmask),
            "lid_entropy": jnp.asarray([ent], jnp.float32),
            "lid_conf": jnp.asarray([conf], jnp.float32),
        }
        logits, uncertainty, feats, seg_conf = self._fwd(self.params, batch)
        self.state, smoothed, final_conf, info = self._step(
            self.temporal_params, self.state, feats, seg_conf)
        smoothed = np.asarray(smoothed, np.float64)
        e = np.exp(smoothed - smoothed.max(axis=1, keepdims=True))
        probs = e / e.sum(axis=1, keepdims=True)
        result = {
            "segment_index": self.segment_index,
            "raw_logits": np.asarray(logits)[0],
            "smoothed_logits": smoothed[0],
            "probabilities": probs[0],
            "prediction": int(smoothed[0].argmax()),
            "confidence": float(np.asarray(final_conf)[0, 0]),
            "uncertainty": float(np.asarray(uncertainty)[0, 0]),
            "speaker_changed": bool(np.asarray(info["speaker_changed"])[0]),
            "speaker_similarity": float(
                np.asarray(info["speaker_similarity"])[0]),
            "language": lang,
        }
        self.segment_index += 1
        return result


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

"""Configuration tree for the whole framework.

One dataclass tree (model/data/train/eval/mesh) serialized into every
checkpoint, replacing the reference's scattered per-script argparse flags
and hard-coded hyperparameters (SURVEY.md §5.6). CLI flag names preserve
reference semantics (/root/reference/src/train.py:27-39, eval.py:71-79).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple, Union

from .models.wav2vec2 import Wav2Vec2Config
from .models.xlmr import XLMRConfig


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    num_labels: int = 4                 # train.py:19 (CREMA scripts use 6)
    adapter_dim: int = 256              # audio_encoder.py:19-21
    shared_dim: int = 256               # cross_attention shared space
    num_heads: int = 8
    proj_dim: int = 512                 # fusion output dim
    classifier_layers: int = 35
    classifier_base_dim: int = 512
    classifier_dropout: float = 0.15    # train.py:68
    cross_dropout: float = 0.1
    # parity defaults the reference hardcodes; exposed so tests/ablations
    # can disable every stochastic path (fusion.py:13-16 Dropout(0.1),
    # classifier.py:28-33 anchor feature-projection Dropout(0.1))
    fusion_dropout: float = 0.1
    anchor_dropout: float = 0.1
    use_quality_gates: bool = True      # audio_encoder.py:9-11 defaults
    use_audio_conditioning: bool = True
    use_asr: bool = False               # text_encoder.py:8 default
    # run the device-side gates/conditioning DSP inside the forward when the
    # batch doesn't carry precomputed quality_feats/cond_feats (the
    # reference runs them inside AudioEncoder.forward, audio_encoder.py:65-88)
    frontend_dsp: bool = True
    # Replicate the reference ENCODER's zeroing (audio_encoder.py:74-77):
    # audio is zeroed unless the abstain decision is 'accept' — i.e. also
    # on 'uncertain'. Since the simulated LID distribution's entropy is
    # >= 1.5 for ANY non-empty text (quality_gates.py:276-300 vs the
    # accept threshold at :383-386), the reference zeroes EVERY clip
    # whenever texts reach the gates (its train.py:145 and TTA eval path).
    # Default False = zero on 'reject' only (the gates' own semantics,
    # quality_gates.py:561-567); True is the bit-faithful reference mode
    # used by the script-level differential harness.
    zero_non_accept: bool = False
    # Replicate the reference's PAD-FRAMES-ARE-VALID audio masking: the
    # base wav2vec2 feature extractor returns NO attention mask
    # (return_attention_mask=False), so AudioEncoder substitutes ALL-ONES
    # at the padded length (audio_encoder.py:140-163) — zero-padded
    # feature frames participate in cross-attention and pooling, making
    # predictions depend on the batch's max clip length. True zeroes the
    # sequence beyond each clip's real frames (the reference pads the
    # feature sequence with exact zeros, audio_encoder.py:152-156) and
    # hands the heads an all-ones mask. Pair with
    # DataConfig.pad_to_batch_max so the padded frame count matches the
    # reference's per-batch max. Default False = true masks.
    pad_frames_valid: bool = False
    audio: Wav2Vec2Config = dataclasses.field(default_factory=Wav2Vec2Config)
    text: XLMRConfig = dataclasses.field(default_factory=XLMRConfig)
    compute_dtype: str = "float32"      # "bfloat16" on TPU hot path
    # gradient-checkpointing policy for both encoder stacks: True/"full"
    # (remat everything — default), "dots" (keep matmul outputs, recompute
    # elementwise — the unfrozen fine-tune lever, models/remat.py),
    # False/"none"
    remat_encoders: Union[bool, str] = True

    @property
    def audio_hidden(self) -> int:
        return self.audio.hidden_size

    @property
    def text_hidden(self) -> int:
        return self.text.hidden_size


def wav2vec2_large_audio_config() -> Wav2Vec2Config:
    """facebook/wav2vec2-large(-960h-lv60 etc.): 24 pre-LN layers, 16 heads,
    1024 hidden, layer-norm conv stack with bias."""
    return Wav2Vec2Config(
        hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
        intermediate_size=4096, conv_bias=True,
        do_stable_layer_norm=True, feat_extract_norm="layer")


def hubert_large_audio_config() -> Wav2Vec2Config:
    """facebook/hubert-large-ls960-ft — same skeleton as wav2vec2-large;
    converts through hf_convert.wav2vec2_from_hf (identical key layout)."""
    return wav2vec2_large_audio_config()


def wavlm_large_audio_config() -> Wav2Vec2Config:
    """microsoft/wavlm-large: wav2vec2-large skeleton (layer-norm conv
    stack, stable pre-LN encoder, no conv bias) + gated bucketed relative
    position bias (HF WavLMAttention, num_buckets=320, max distance 800)."""
    return Wav2Vec2Config(
        hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
        intermediate_size=4096, conv_bias=False,
        do_stable_layer_norm=True, feat_extract_norm="layer",
        gated_relpos_bias=True, num_buckets=320, max_bucket_distance=800)


AUDIO_BACKBONE_PRESETS = {
    "wav2vec2-base": Wav2Vec2Config,
    "wav2vec2-large": wav2vec2_large_audio_config,
    "hubert-large": hubert_large_audio_config,
    "wavlm-large": wavlm_large_audio_config,
}


@dataclasses.dataclass(frozen=True)
class DataConfig:
    sample_rate: int = 16000
    max_audio_seconds: float = 30.0     # preprocess.py:30-32
    min_audio_seconds: float = 0.5      # preprocess.py:35-39
    max_text_tokens: int = 64
    audio_buckets: Tuple[float, ...] = (2.0, 4.0, 8.0, 16.0, 30.0)
    dataset_root: str = "datasets"      # preprocess.py:10-12 path prefix
    # emit per-utterance 8-dim ASR features in batches (host-side
    # EnhancedASRIntegration; transcribes with Whisper only when the
    # manifest text is empty, like text_encoder.py:39-48)
    emit_asr_feats: bool = False
    # False replicates the reference's plain (non-TTA) eval loop, which
    # calls audio_encoder(audio_list) WITHOUT texts (eval.py:192) so every
    # gate call takes the no-text LID fallback (1.0, "unknown", 0.0)
    # (quality_gates.py:509-512); the batch then carries those constants
    # instead of host-computed LID.
    gates_see_text: bool = True
    # Pad audio to the BATCH's max clip length instead of the bucket cap —
    # the reference's eager per-batch padding (audio_encoder.py:147-171).
    # Costs one XLA compile per distinct batch shape; only for
    # reference-faithful comparison runs (pairs with
    # ModelConfig.pad_frames_valid).
    pad_to_batch_max: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    epochs: int = 5
    batch_size: int = 4
    lr: float = 1e-4
    warmup_ratio: float = 0.1
    augment: bool = False
    # one speed factor per step (lax.switch, single resample branch) vs one
    # per sample (all branches materialized). 3x cheaper at the 30 s bucket
    # (8 vs 24 ms on v5e); marginal factor distribution per sample across
    # steps is identical — see ops/audio_dsp.augment_batch.
    augment_speed_per_batch: bool = True
    proto_weight: float = 0.05
    save_dir: str = "checkpoints"
    resume_from: Optional[str] = None
    grad_clip: Optional[float] = None   # train_crema.py uses 1.0
    # microbatches per optimizer step (lax.scan inside the jitted step);
    # bounds activation memory at large effective batches — batch_size
    # stays the effective batch, must be divisible by grad_accum
    grad_accum: int = 1
    # store the audio/text backbone groups' AdamW first moment in this
    # dtype ("bfloat16" halves the dominant mu memory when fine-tuning
    # unfrozen; optax has no nu_dtype, the second moment stays f32).
    # None keeps f32 everywhere.
    backbone_moment_dtype: Optional[str] = None
    seed: int = 0
    # loss mix (train.py:151-168)
    focal_weight: float = 0.3
    anchor_weight: float = 0.1
    uncertainty_weight: float = 0.05
    proto_term_weight: float = 0.01
    supcon_weight: float = 0.0          # defined but disabled in reference
    label_smoothing: float = 0.1
    scheduler: str = "warmup_cosine"    # or "cosine_restarts" (train_crema.py:45-69)
    restart_period_epochs: int = 3
    early_stop_patience: Optional[int] = None
    freeze_backbones: bool = True       # audio_encoder.py:15-17, text_encoder.py:13-15
    # train_crema.py preset knobs
    proto_l2_normalize: bool = False    # proto loss on L2-normalized fused (train_crema.py:330)
    focal_beta: float = 0.9999          # train_crema.py softens to 0.99
    focal_gamma: float = 2.0            # train_crema.py softens to 1.0
    # train_crema_final.py preset knobs: extra CE on an augmented forward,
    # applied to a fraction of steps (train_crema_final.py:283-292)
    consistency_aug_weight: float = 0.0
    consistency_aug_fraction: float = 0.3


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data_axis: int = -1                 # -1: all remaining devices on data
    model_axis: int = 1
    dcn_data: int = 1                   # >1: multi-slice pod — data_axis
    #                                     counts per-slice shards; the DCN
    #                                     axis folds slice-major into 'data'
    #                                     (parallel/mesh.py:make_mesh)
    fsdp: bool = False                  # ZeRO-style param/grad/opt-state
    #                                     sharding over 'data'
    #                                     (parallel/mesh.py:param_shardings)
    fsdp_min_size: Optional[int] = None # leaves smaller than this replicate
    #                                     (None: mesh.FSDP_MIN_SIZE = 32768)


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


def to_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2)


def _from_dict(cls, d: dict):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            continue
        ft = fields[k].type
        if isinstance(v, dict):
            sub = {"model": ModelConfig, "data": DataConfig, "train": TrainConfig,
                   "mesh": MeshConfig, "audio": Wav2Vec2Config, "text": XLMRConfig}.get(k)
            kwargs[k] = _from_dict(sub, v) if sub else v
        elif isinstance(v, list):
            kwargs[k] = tuple(v)
        else:
            kwargs[k] = v
    return cls(**kwargs)


def from_json(s: str) -> Config:
    return _from_dict(Config, json.loads(s))

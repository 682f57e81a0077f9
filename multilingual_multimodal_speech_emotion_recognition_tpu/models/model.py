"""The full SER model: one pytree, one jitted forward.

The reference instantiates 8 loose nn.Modules per script and chains them
eagerly (/root/reference/src/train.py:54-69, 145-152). Here the entire
forward — audio encoder (+adapter, +front-end feature fusion), text encoder
(+adapter, +ASR feature fusion), bidirectional cross-modal attention,
attentive-stats pooling ×2, gated fusion, deep OpenMax classifier, prototype
memory — is a single pure function over one parameter pytree, compiled once
by XLA and shardable with pjit.

Pipeline parity map (reference file:line):
  audio adapter + residual        audio_encoder.py:19-21, 112
  quality/cond/combined fusion    audio_encoder.py:27-52, 127-138
  text adapter + asr_fusion       text_encoder.py:18-30, 57-73
  cross-modal attention           train.py:147
  pooling / fusion / classifier   train.py:148-152
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import pooling as pooling_ops
from . import classifier as clf
from . import cross_attention as cma
from . import fusion as fusion_mod
from . import layers
from . import prototypes as protos
from . import wav2vec2 as w2v
from . import xlmr as xlmr_mod

Array = jax.Array


class ModelOutput(NamedTuple):
    logits: Array               # [B, C]
    uncertainty: Array          # [B, 1]
    anchor_loss: Array          # scalar
    anchor_similarities: Array  # [B, C]
    features: Array             # [B, base_dim//2] classifier penultimate
    fused: Array                # [B, proj_dim] fusion output (prototype space)
    audio_vec: Array            # [B, 2*audio_hidden]
    text_vec: Array             # [B, 2*text_hidden]


def _init_feature_fusion(key, hid: int, extra: int, dtype) -> dict:
    return {"lin": layers.init_linear(key, hid + extra, hid, dtype=dtype)}


def _init_feature_proj(key, dim: int, dtype) -> dict:
    """Learned d->32->d projection the reference applies to each front-end
    feature vector before fusing it into the encoder sequence:
    quality 8->32->8 (quality_gates.py:438-444, applied :554), conditioning
    12->32->12 (audio_conditioning.py:455-460, applied :578), ASR 8->32->8
    (asr_integration.py:536-541, applied :598)."""
    k1, k2 = jax.random.split(key)
    return {"lin1": layers.init_linear(k1, dim, 32, dtype=dtype),
            "lin2": layers.init_linear(k2, 32, dim, dtype=dtype)}


def _feature_proj(p: dict, feats: Array, *, dropout_key,
                  deterministic: bool) -> Array:
    """Linear(d,32) -> ReLU -> Dropout(0.1) -> Linear(32,d)."""
    h = jax.nn.relu(layers.linear(p["lin1"], feats))
    h = layers.dropout(dropout_key, h, 0.1, deterministic)
    return layers.linear(p["lin2"], h)


def init_model(key: Array, cfg: ModelConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 18)
    ah, th = cfg.audio_hidden, cfg.text_hidden
    params = {
        "audio_backbone": w2v.init_wav2vec2(ks[0], cfg.audio, dtype),
        "audio_adapter": {
            "down": layers.init_linear(ks[1], ah, cfg.adapter_dim, dtype=dtype),
            "up": layers.init_linear(ks[2], cfg.adapter_dim, ah, dtype=dtype),
        },
        "text_backbone": xlmr_mod.init_xlmr(ks[3], cfg.text, dtype),
        "text_adapter": {
            "down": layers.init_linear(ks[4], th, cfg.adapter_dim, dtype=dtype),
            "up": layers.init_linear(ks[5], cfg.adapter_dim, th, dtype=dtype),
        },
        "asr_fusion": _init_feature_fusion(ks[6], th, 8, dtype),
        # ASR projection mirrors asr_fusion's unconditional init (the
        # reference keeps asr_fusion "regardless to keep shapes stable",
        # text_encoder.py:26-30; its asr_projection lives in the lazily
        # created EnhancedASRIntegration, asr_integration.py:536-541)
        "asr_proj": _init_feature_proj(ks[15], 8, dtype),
        "cross": cma.init_cross_modal_attention(ks[7], ah, th, cfg.shared_dim,
                                                cfg.num_heads, dtype),
        "pool_a": pooling_ops.init_attentive_stats_pooling(ks[8], ah, dtype=dtype),
        "pool_t": pooling_ops.init_attentive_stats_pooling(ks[9], th, dtype=dtype),
        "fusion": fusion_mod.init_fusion(ks[10], 2 * ah, 2 * th, cfg.proj_dim, dtype),
        "classifier": clf.init_classifier(ks[11], cfg.proj_dim, cfg.num_labels,
                                          cfg.classifier_layers,
                                          cfg.classifier_base_dim, dtype),
        "prototypes": protos.init_prototypes(ks[12], cfg.num_labels,
                                             cfg.proj_dim, dtype),
    }
    if cfg.use_quality_gates and cfg.use_audio_conditioning:
        params["combined_fusion"] = _init_feature_fusion(ks[13], ah, 20, dtype)
    elif cfg.use_quality_gates:
        params["quality_fusion"] = _init_feature_fusion(ks[13], ah, 8, dtype)
    elif cfg.use_audio_conditioning:
        params["conditioning_fusion"] = _init_feature_fusion(ks[13], ah, 12, dtype)
    if cfg.use_quality_gates:
        params["quality_proj"] = _init_feature_proj(ks[14], 8, dtype)
    if cfg.use_audio_conditioning:
        params["cond_proj"] = _init_feature_proj(ks[16], 12, dtype)
    return params


def _adapter(p: dict, x: Array) -> Array:
    """Bottleneck adapter with residual add (audio_encoder.py:19-21, 112)."""
    return x + layers.linear(p["up"], jax.nn.relu(layers.linear(p["down"], x)))


def _feature_fuse(p: dict, seq: Array, feats: Array, *, dropout_rate: float,
                  dropout_key, deterministic: bool) -> Array:
    """Broadcast per-utterance features along time, concat, Linear+ReLU+Drop
    (audio_encoder.py:27-52 fusion blocks)."""
    B, S, _ = seq.shape
    f = jnp.broadcast_to(feats[:, None, :], (B, S, feats.shape[-1])).astype(seq.dtype)
    y = layers.linear(p["lin"], jnp.concatenate([seq, f], axis=-1))
    y = jax.nn.relu(y)
    return layers.dropout(dropout_key, y, dropout_rate, deterministic)


def cast_floating(tree, dtype):
    """Cast float leaves to the compute dtype. Int8 kernels pass through
    (integer), and their dequantization scales (`w_scale`, ops/quant.py)
    stay f32 — rounding them to bf16 would waste quantization accuracy."""
    def cast(path, x):
        if not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        if path and getattr(path[-1], "key", None) == "w_scale":
            return x
        return x.astype(dtype)
    return jax.tree_util.tree_map_with_path(cast, tree)


def encode_audio(params: dict, cfg: ModelConfig, wave: Array, wave_mask: Array,
                 *, quality_feats: Optional[Array] = None,
                 cond_feats: Optional[Array] = None,
                 deterministic: bool = True, dropout_key=None,
                 spec_augment: bool = False):
    """[B, T] waveform -> ([B, T', ah] sequence, [B, T'] frame mask)."""
    if dropout_key is not None:
        k_bb, k_f, k_pq, k_pc = jax.random.split(dropout_key, 4)
    else:
        k_bb = k_f = k_pq = k_pc = None
    seq, frame_mask = w2v.wav2vec2_encode(
        params["audio_backbone"], cfg.audio, wave, wave_mask,
        deterministic=deterministic, dropout_key=k_bb,
        spec_augment=spec_augment, remat=cfg.remat_encoders)
    seq = _adapter(params["audio_adapter"], seq)

    uq, uc = cfg.use_quality_gates, cfg.use_audio_conditioning
    if uq or uc:
        B = seq.shape[0]
        q = quality_feats if quality_feats is not None else jnp.zeros((B, 8), seq.dtype)
        c = cond_feats if cond_feats is not None else jnp.zeros((B, 12), seq.dtype)
        # learned d->32->d projections the reference applies to the raw
        # feature vectors before fusion (quality_gates.py:554,
        # audio_conditioning.py:578)
        if uq:
            q = _feature_proj(params["quality_proj"], q.astype(seq.dtype),
                              dropout_key=k_pq, deterministic=deterministic)
        if uc:
            c = _feature_proj(params["cond_proj"], c.astype(seq.dtype),
                              dropout_key=k_pc, deterministic=deterministic)
        if uq and uc:
            seq = _feature_fuse(params["combined_fusion"], seq,
                                jnp.concatenate([q, c], axis=-1),
                                dropout_rate=0.1, dropout_key=k_f,
                                deterministic=deterministic)
        elif uq:
            seq = _feature_fuse(params["quality_fusion"], seq, q,
                                dropout_rate=0.1, dropout_key=k_f,
                                deterministic=deterministic)
        else:
            seq = _feature_fuse(params["conditioning_fusion"], seq, c,
                                dropout_rate=0.1, dropout_key=k_f,
                                deterministic=deterministic)
    if cfg.pad_frames_valid:
        # reference semantics (audio_encoder.py:140-163): the per-clip
        # feature sequence is zero-PADDED and the substituted mask is all
        # ones, so pad frames are valid zero vectors downstream
        seq = seq * frame_mask[..., None].astype(seq.dtype)
        frame_mask = jnp.ones_like(frame_mask)
    return seq, frame_mask


def encode_text(params: dict, cfg: ModelConfig, input_ids: Array,
                text_mask: Array, *, asr_feats: Optional[Array] = None,
                deterministic: bool = True, dropout_key=None):
    """[B, S] token ids -> ([B, S, th] sequence, [B, S] mask)."""
    if dropout_key is not None:
        k_bb, k_f, k_p = jax.random.split(dropout_key, 3)
    else:
        k_bb = k_f = k_p = None
    seq = xlmr_mod.xlmr_encode(params["text_backbone"], cfg.text, input_ids,
                               text_mask, deterministic=deterministic,
                               dropout_key=k_bb, remat=cfg.remat_encoders)
    seq = _adapter(params["text_adapter"], seq)
    if cfg.use_asr and asr_feats is not None:
        # the reference projects ASR features inside EnhancedASRIntegration
        # before fusing (asr_integration.py:598)
        asr_p = _feature_proj(params["asr_proj"], asr_feats.astype(seq.dtype),
                              dropout_key=k_p, deterministic=deterministic)
        seq = _feature_fuse(params["asr_fusion"], seq, asr_p,
                            dropout_rate=0.1, dropout_key=k_f,
                            deterministic=deterministic)
    return seq, text_mask


def frontend_features(cfg: ModelConfig, batch: dict):
    """Device-side front-end DSP, replacing the per-sample host loop the
    reference runs inside AudioEncoder.forward (audio_encoder.py:65-88):
    gates may zero rejected audio; conditioning filters feed the encoder.
    Returns (wave, quality_feats, cond_feats); feats stay None when the
    front-end is disabled and the batch carries none."""
    wave = batch["audio"]
    wave_mask = batch["audio_mask"]
    quality_feats = batch.get("quality_feats")
    cond_feats = batch.get("cond_feats")
    if (cfg.frontend_dsp and (cfg.use_quality_gates or cfg.use_audio_conditioning)
            and quality_feats is None and cond_feats is None):
        from ..frontend import frontend_process
        B = wave.shape[0]
        # no-text LID fallback = entropy 1.0, conf 0 (quality_gates.py:510-512)
        ent = batch.get("lid_entropy", jnp.full((B,), 1.0, jnp.float32))
        conf = batch.get("lid_conf", jnp.zeros((B,), jnp.float32))
        wave, quality_feats, cond_feats, _ = frontend_process(
            wave.astype(jnp.float32), wave_mask.astype(jnp.float32),
            lid_entropy=ent, lid_confidence=conf,
            use_gates=cfg.use_quality_gates,
            use_conditioning=cfg.use_audio_conditioning,
            zero_non_accept=cfg.zero_non_accept)
    return wave, quality_feats, cond_feats


def model_heads(params: dict, cfg: ModelConfig, a_seq: Array, a_mask: Array,
                t_seq: Array, t_mask: Array, *,
                deterministic: bool = True,
                dropout_key: Optional[Array] = None,
                use_openmax: bool = False) -> ModelOutput:
    """Cross-modal attention -> pooling x2 -> gated fusion -> classifier,
    from already-encoded modality sequences (`params` is the raw/uncast
    tree). Split out so the interface's feature-averaging TTA
    (reference interface.py:181-204) can run the heads once over averaged
    audio features."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    p = cast_floating(params, dtype) if dtype != jnp.float32 else params
    if dropout_key is not None:
        k_x, k_fu, k_c = jax.random.split(dropout_key, 3)
    else:
        k_x = k_fu = k_c = None

    a_enh, t_enh = cma.cross_modal_attention(
        p["cross"], a_seq, t_seq, a_mask, t_mask, num_heads=cfg.num_heads,
        dropout_rate=cfg.cross_dropout, dropout_key=k_x,
        deterministic=deterministic)

    a_vec = pooling_ops.attentive_stats_pooling(p["pool_a"], a_enh, a_mask)
    t_vec = pooling_ops.attentive_stats_pooling(p["pool_t"], t_enh, t_mask)

    fused = fusion_mod.fusion(p["fusion"], a_vec, t_vec,
                              dropout_rate=cfg.fusion_dropout, dropout_key=k_fu,
                              deterministic=deterministic)

    # classifier numerics stay f32 (tiny FLOPs, parity-critical)
    out = clf.classifier_forward(
        params["classifier"], fused.astype(jnp.float32),
        use_openmax=use_openmax, dropout_rate=cfg.classifier_dropout,
        anchor_dropout=cfg.anchor_dropout,
        dropout_key=k_c, deterministic=deterministic)

    return ModelOutput(logits=out.logits, uncertainty=out.uncertainty,
                       anchor_loss=out.anchor_loss,
                       anchor_similarities=out.anchor_similarities,
                       features=out.features, fused=fused.astype(jnp.float32),
                       audio_vec=a_vec, text_vec=t_vec)


def model_forward(params: dict, cfg: ModelConfig, batch: dict, *,
                  deterministic: bool = True,
                  dropout_key: Optional[Array] = None,
                  use_openmax: bool = False,
                  spec_augment: bool = False) -> ModelOutput:
    """batch keys: audio [B,T] f32, audio_mask [B,T], text_ids [B,S] i32,
    text_mask [B,S]; optional quality_feats [B,8], cond_feats [B,12],
    asr_feats [B,8]."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    p = cast_floating(params, dtype) if dtype != jnp.float32 else params

    if dropout_key is not None:
        k_a, k_t, k_heads = jax.random.split(dropout_key, 3)
    else:
        k_a = k_t = k_heads = None

    wave, quality_feats, cond_feats = frontend_features(cfg, batch)
    wave_mask = batch["audio_mask"]

    a_seq, a_mask = encode_audio(
        p, cfg, wave.astype(dtype), wave_mask,
        quality_feats=quality_feats, cond_feats=cond_feats,
        deterministic=deterministic, dropout_key=k_a,
        spec_augment=spec_augment)
    t_seq, t_mask = encode_text(
        p, cfg, batch["text_ids"], batch["text_mask"],
        asr_feats=batch.get("asr_feats"),
        deterministic=deterministic, dropout_key=k_t)

    return model_heads(params, cfg, a_seq, a_mask, t_seq, t_mask,
                       deterministic=deterministic, dropout_key=k_heads,
                       use_openmax=use_openmax)


def load_pretrained_backbones(params: dict, *, wav2vec2_state=None,
                              xlmr_state=None) -> dict:
    """Swap randomly-initialized backbones for converted HF weights
    (layer/conv counts inferred from the state dict)."""
    from . import hf_convert
    params = dict(params)
    if wav2vec2_state is not None:
        params["audio_backbone"] = hf_convert.wav2vec2_from_hf(wav2vec2_state)
    if xlmr_state is not None:
        params["text_backbone"] = hf_convert.xlmr_from_hf(xlmr_state)
    return params

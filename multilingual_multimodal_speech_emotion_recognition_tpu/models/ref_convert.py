"""Reference-checkpoint import: torch .pt -> our parameter pytree.

The reference's trainers all save the same flat torch dict of 8 module
state_dicts plus optimizer/scheduler/epoch/f1
(/root/reference/src/train.py:247-263, train_crema.py:463-488,
src/train_crema_final.py:378-400). A user migrating from the reference
carries those .pt files; this module maps every learned tensor into our
tree so `cli/eval.py`, `interface.py`, export, and serving consume the
trained weights directly.

What maps where (reference module attribute -> our tree key):
  audio_encoder.encoder.*            -> audio_backbone   (hf_convert)
  audio_encoder.adapter.{0,2}        -> audio_adapter.{down,up}
  audio_encoder.{combined,quality,conditioning}_fusion.0
                                     -> {combined,quality,conditioning}_fusion.lin
  audio_encoder.quality_gates.quality_projection.{0,3}
                                     -> quality_proj.{lin1,lin2}
  audio_encoder.audio_conditioning.conditioning_projection.{0,3}
                                     -> cond_proj.{lin1,lin2}
  text_encoder.encoder.*             -> text_backbone    (hf_convert)
  text_encoder.adapter.{0,2}         -> text_adapter.{down,up}
  text_encoder.asr_fusion.0          -> asr_fusion.lin
  text_encoder.asr_integration.asr_projection.{0,3} (lazy; usually absent)
                                     -> asr_proj.{lin1,lin2}
  cross / pool_a / pool_t / fusion / prototypes -> same-named subtrees
  classifier (AdvancedOpenMaxClassifier, classifier.py:155-305)
                                     -> classifier (incl. Weibull buffers)

Deliberately NOT mapped (and reported as skipped): the unused
AttentiveStatsPooling instances inside each encoder (`pool.*` — dead
weights on every reference train/eval path; the live pools are the
separate pool_a/pool_t modules), and optimizer/scheduler state (torch
AdamW moments are not meaningful to an optax restart; resume re-warms).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import numpy as np

from . import hf_convert

Array = np.ndarray


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _sub(sd: Mapping, prefix: str) -> dict:
    pre = prefix + "."
    return {k[len(pre):]: v for k, v in sd.items() if k.startswith(pre)}


def _lin(sd: Mapping, prefix: str) -> dict:
    return {"kernel": _np(sd[f"{prefix}.weight"]).T.copy(),
            "bias": _np(sd[f"{prefix}.bias"])}


def _ln(sd: Mapping, prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _mha(sd: Mapping, prefix: str) -> dict:
    """torch nn.MultiheadAttention state_dict -> our q/k/v/out layout."""
    w = _np(sd[f"{prefix}.in_proj_weight"])
    b = _np(sd[f"{prefix}.in_proj_bias"])
    E = w.shape[0] // 3
    return {
        "q": {"kernel": w[:E].T.copy(), "bias": b[:E].copy()},
        "k": {"kernel": w[E:2 * E].T.copy(), "bias": b[E:2 * E].copy()},
        "v": {"kernel": w[2 * E:].T.copy(), "bias": b[2 * E:].copy()},
        "out": {"kernel": _np(sd[f"{prefix}.out_proj.weight"]).T.copy(),
                "bias": _np(sd[f"{prefix}.out_proj.bias"])},
    }


def _proj(sd: Mapping, prefix: str) -> dict:
    """Sequential(Linear(d,32), ReLU, Dropout, Linear(32,d)) -> feature
    projection tree (quality_gates.py:438-444 and siblings)."""
    return {"lin1": _lin(sd, f"{prefix}.0"), "lin2": _lin(sd, f"{prefix}.3")}


def cross_from_ref(sd: Mapping) -> dict:
    """CrossModalAttention state_dict (cross_attention.py:6-53)."""
    return {
        "q_a": _lin(sd, "q_a"), "k_t": _lin(sd, "k_t"), "v_t": _lin(sd, "v_t"),
        "attn_a": _mha(sd, "attn_a"), "out_a": _lin(sd, "out_a"),
        "q_t": _lin(sd, "q_t"), "k_a": _lin(sd, "k_a"), "v_a": _lin(sd, "v_a"),
        "attn_t": _mha(sd, "attn_t"), "out_t": _lin(sd, "out_t"),
        "norm_a": _ln(sd, "norm_a"), "norm_t": _ln(sd, "norm_t"),
    }


def pool_from_ref(sd: Mapping) -> dict:
    """AttentiveStatsPooling state_dict (pooling.py:8-14)."""
    return {"w1": _lin(sd, "attention.0"), "w2": _lin(sd, "attention.2")}


def fusion_from_ref(sd: Mapping) -> dict:
    """FusionLayer state_dict (fusion.py:5-16)."""
    return {
        "proj_a1": _lin(sd, "proj_a.0"), "proj_a2": _lin(sd, "proj_a.3"),
        "proj_t1": _lin(sd, "proj_t.0"), "proj_t2": _lin(sd, "proj_t.3"),
        "gate_a1": _lin(sd, "gate_a.0"), "gate_a2": _lin(sd, "gate_a.2"),
        "gate_t1": _lin(sd, "gate_t.0"), "gate_t2": _lin(sd, "gate_t.2"),
    }


def classifier_from_ref(sd: Mapping) -> dict:
    """AdvancedOpenMaxClassifier state_dict -> our stacked-scan tree
    (classifier.py:155-305; Sequential indices: block 0=LN 1=Linear 4=Linear,
    per-layer extra LN in deep_classifier.layer_norms)."""
    n_layers = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("deep_classifier.residual_layers."))
    per_layer = []
    for i in range(n_layers):
        blk = f"deep_classifier.residual_layers.{i}.block"
        per_layer.append({
            "ln_pre": _ln(sd, f"deep_classifier.layer_norms.{i}"),
            "block_ln": _ln(sd, f"{blk}.0"),
            "block_lin1": _lin(sd, f"{blk}.1"),
            "block_lin2": _lin(sd, f"{blk}.4"),
        })
    stacked = {
        outer: {inner: np.stack([p[outer][inner] for p in per_layer])
                for inner in per_layer[0][outer]}
        for outer in per_layer[0]
    }
    return {
        "input_proj": _lin(sd, "deep_classifier.input_projection.0"),
        "input_ln": _ln(sd, "deep_classifier.input_projection.1"),
        "layers": stacked,
        "out_proj1": _lin(sd, "deep_classifier.output_projection.0"),
        "out_ln": _ln(sd, "deep_classifier.output_projection.1"),
        "out_proj2": _lin(sd, "deep_classifier.output_projection.4"),
        "anchor": {
            "class_anchors": _np(sd["anchor_clustering.class_anchors"]),
            "projection": _lin(sd, "anchor_clustering.anchor_projection.0"),
            "proj_ln": _ln(sd, "anchor_clustering.anchor_projection.1"),
            "temperature": _np(sd["anchor_clustering.temperature"]),
        },
        "uncertainty": {
            "lin1": _lin(sd, "uncertainty_head.0"),
            "lin2": _lin(sd, "uncertainty_head.3"),
        },
        "weibull": {
            "alpha": _np(sd["weibull_alpha"]),
            "beta": _np(sd["weibull_beta"]),
            "tau": _np(sd["weibull_tau"]),
            "activation_vectors": _np(sd["activation_vectors"]),
        },
    }


_AE_FUSIONS = {"combined_fusion": "combined_fusion",
               "quality_fusion": "quality_fusion",
               "conditioning_fusion": "conditioning_fusion"}


def infer_model_config(ckpt: Mapping, base_cfg=None):
    """Derive a ModelConfig matching the checkpoint's shapes/flags.

    Shape-derivable fields are inferred; the rest (dropout rates, bucket
    heuristics) keep `base_cfg` (default ModelConfig) values. Backbone
    variant detection mirrors hf_convert's key probes: per-conv LayerNorms
    => feat_extract_norm="layer"; rel_attn_embed => WavLM gated relpos;
    hidden 1024 => the stable pre-LN (do_stable_layer_norm) encoder every
    large checkpoint uses (HF key layouts are identical either way, so the
    width is the only signal — and it is reliable across the whole
    wav2vec2/HuBERT/WavLM family)."""
    from ..config import ModelConfig  # local import: avoid cycle
    from .wav2vec2 import Wav2Vec2Config
    from .xlmr import XLMRConfig

    base = base_cfg if base_cfg is not None else ModelConfig()
    a_sd = ckpt["audio_encoder"]
    t_sd = ckpt["text_encoder"]
    c_sd = ckpt["classifier"]

    # --- audio backbone ---
    a_bb = _sub(a_sd, "encoder")
    conv_kernels = []
    i = 0
    while f"feature_extractor.conv_layers.{i}.conv.weight" in a_bb:
        conv_kernels.append(_np(
            a_bb[f"feature_extractor.conv_layers.{i}.conv.weight"]))
        i += 1
    ah = int(_np(a_bb["encoder.layers.0.attention.q_proj.weight"]).shape[0])
    n_audio_layers = 1 + max(int(k.split(".")[2]) for k in a_bb
                             if k.startswith("encoder.layers."))
    # pos-conv geometry from the (possibly weight-normed) conv weight:
    # torch Conv1d weight is [out=H, in/groups, kernel]
    pos_w = hf_convert._pos_conv_weight(a_bb, "encoder.pos_conv_embed.conv")
    pos_kernel = int(pos_w.shape[2])
    pos_groups = ah // int(pos_w.shape[1])
    audio = Wav2Vec2Config(
        conv_dim=tuple(int(w.shape[0]) for w in conv_kernels),
        conv_kernel=tuple(int(w.shape[2]) for w in conv_kernels),
        conv_stride=base.audio.conv_stride[:len(conv_kernels)],
        conv_bias="feature_extractor.conv_layers.0.conv.bias" in a_bb,
        hidden_size=ah, num_hidden_layers=n_audio_layers,
        # head count is not shape-derivable (separate q/k/v projections are
        # [H,H] regardless); keep base_cfg's when the width matches it, else
        # the family rule (base=12 heads @768, large=16 @1024)
        num_attention_heads=(base.audio.num_attention_heads
                             if ah == base.audio.hidden_size
                             else 16 if ah >= 1024 else 12),
        intermediate_size=int(_np(
            a_bb["encoder.layers.0.feed_forward.intermediate_dense.weight"]
        ).shape[0]),
        num_conv_pos_embeddings=pos_kernel,
        num_conv_pos_embedding_groups=pos_groups,
        do_stable_layer_norm=(base.audio.do_stable_layer_norm
                              if ah == base.audio.hidden_size
                              else ah >= 1024),
        feat_extract_norm=("layer" if
                           "feature_extractor.conv_layers.1.layer_norm.weight"
                           in a_bb else "group"),
        gated_relpos_bias=any("rel_attn_embed" in k for k in a_bb),
    )

    # --- text backbone ---
    t_bb = _sub(t_sd, "encoder")
    emb = _np(t_bb["embeddings.word_embeddings.weight"])
    th = int(emb.shape[1])
    n_text_layers = 1 + max(int(k.split(".")[2]) for k in t_bb
                            if k.startswith("encoder.layer."))
    text = XLMRConfig(
        vocab_size=int(emb.shape[0]), hidden_size=th,
        num_hidden_layers=n_text_layers,
        num_attention_heads=(base.text.num_attention_heads
                             if th == base.text.hidden_size
                             else 16 if th >= 1024 else 12),
        intermediate_size=int(_np(
            t_bb["encoder.layer.0.intermediate.dense.weight"]).shape[0]),
        max_position_embeddings=int(_np(
            t_bb["embeddings.position_embeddings.weight"]).shape[0]),
    )

    # --- heads geometry ---
    out_w = _np(c_sd["deep_classifier.output_projection.4.weight"])
    in_w = _np(c_sd["deep_classifier.input_projection.0.weight"])
    n_clf = 1 + max(int(k.split(".")[2]) for k in c_sd
                    if k.startswith("deep_classifier.residual_layers."))
    shared = int(_np(ckpt["cross"]["q_a.weight"]).shape[0])
    adapter = int(_np(a_sd["adapter.0.weight"]).shape[0])

    return dataclasses.replace(
        base,
        num_labels=int(out_w.shape[0]),
        adapter_dim=adapter,
        shared_dim=shared,
        proj_dim=int(in_w.shape[1]),
        classifier_layers=n_clf,
        classifier_base_dim=int(in_w.shape[0]),
        use_quality_gates=any(k.startswith("quality_fusion.")
                              or k.startswith("combined_fusion.")
                              for k in a_sd),
        use_audio_conditioning=any(k.startswith("conditioning_fusion.")
                                   or k.startswith("combined_fusion.")
                                   for k in a_sd),
        audio=audio, text=text,
    )


def params_from_reference_checkpoint(ckpt: Mapping, cfg, init_params: dict):
    """Map a loaded reference checkpoint dict into a copy of `init_params`.

    Returns (params, report): report lists which of our subtrees were
    imported vs left at their fresh initialization (e.g. asr_proj when the
    reference never instantiated its lazy ASR module), and which reference
    tensors were deliberately skipped. Shape mismatches raise.
    """
    params = dict(init_params)
    imported, left = [], []
    a_sd, t_sd = ckpt["audio_encoder"], ckpt["text_encoder"]

    def put(name: str, value) -> None:
        _check_shapes(name, init_params[name], value)
        params[name] = value
        imported.append(name)

    put("audio_backbone", hf_convert.wav2vec2_from_hf(_sub(a_sd, "encoder")))
    put("audio_adapter", {"down": _lin(a_sd, "adapter.0"),
                          "up": _lin(a_sd, "adapter.2")})
    put("text_backbone", hf_convert.xlmr_from_hf(_sub(t_sd, "encoder")))
    put("text_adapter", {"down": _lin(t_sd, "adapter.0"),
                         "up": _lin(t_sd, "adapter.2")})
    put("cross", cross_from_ref(ckpt["cross"]))
    put("pool_a", pool_from_ref(ckpt["pool_a"]))
    put("pool_t", pool_from_ref(ckpt["pool_t"]))
    put("fusion", fusion_from_ref(ckpt["fusion"]))
    put("classifier", classifier_from_ref(ckpt["classifier"]))
    put("prototypes", {"prototypes": _np(ckpt["prototypes"]["prototypes"])})

    for ref_name, ours in _AE_FUSIONS.items():
        if ours in init_params and f"{ref_name}.0.weight" in a_sd:
            put(ours, {"lin": _lin(a_sd, f"{ref_name}.0")})
    if "asr_fusion.0.weight" in t_sd:
        put("asr_fusion", {"lin": _lin(t_sd, "asr_fusion.0")})
    if ("quality_proj" in init_params
            and "quality_gates.quality_projection.0.weight" in a_sd):
        put("quality_proj", _proj(a_sd, "quality_gates.quality_projection"))
    if ("cond_proj" in init_params
            and "audio_conditioning.conditioning_projection.0.weight" in a_sd):
        put("cond_proj",
            _proj(a_sd, "audio_conditioning.conditioning_projection"))
    if "asr_integration.asr_projection.0.weight" in t_sd:
        put("asr_proj", _proj(t_sd, "asr_integration.asr_projection"))

    left = sorted(set(init_params) - set(imported))
    skipped = sorted(
        {f"audio_encoder.{k}" for k in a_sd if k.startswith("pool.")}
        | {f"text_encoder.{k}" for k in t_sd if k.startswith("pool.")}
        | ({"optimizer", "scheduler"} & set(ckpt)))
    report = {"imported": sorted(imported), "left_at_init": left,
              "skipped": skipped,
              "epoch": int(ckpt.get("epoch", 0)),
              "f1": float(ckpt.get("f1", 0.0))}
    return params, report


def _check_shapes(name: str, template, value) -> None:
    import jax

    t_leaves = jax.tree_util.tree_flatten_with_path(template)[0]
    v = {tuple(str(p) for p in path): leaf
         for path, leaf in jax.tree_util.tree_flatten_with_path(value)[0]}
    for path, leaf in t_leaves:
        key = tuple(str(p) for p in path)
        if key not in v:
            raise ValueError(f"{name}: converted tree is missing leaf {key}")
        if tuple(np.shape(v[key])) != tuple(np.shape(leaf)):
            raise ValueError(
                f"{name}{''.join(map(str, path))}: shape "
                f"{np.shape(v[key])} != expected {np.shape(leaf)} — the "
                "checkpoint does not match the model config (pass/infer a "
                "matching config)")
    extra = set(v) - {tuple(str(p) for p in path) for path, _ in t_leaves}
    if extra:
        raise ValueError(f"{name}: converted tree has unexpected leaves "
                         f"{sorted(extra)[:3]}")


def load_reference_checkpoint(path: str):
    """torch.load the reference .pt (weights_only when supported)."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        return torch.load(path, map_location="cpu", weights_only=False)

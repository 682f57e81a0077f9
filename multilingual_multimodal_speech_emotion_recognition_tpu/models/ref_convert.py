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


def _snap_heads(hidden: int, base_hidden: int, base_heads: int) -> int:
    """Head count is not shape-derivable (separate q/k/v projections are
    [H, H] regardless of heads): keep base_cfg's when the width matches,
    else the family rule (12 below 1024, 16 at/above), snapped DOWN to the
    largest divisor of `hidden` so the imported config always yields a
    runnable forward (a non-dividing head count crashes the attention
    reshape). Overridable via cli/import_checkpoint.py --audio_heads /
    --text_heads for models trained with a different count."""
    if hidden == base_hidden:
        return base_heads
    h = min(16 if hidden >= 1024 else 12, hidden)
    while hidden % h:
        h -= 1
    return h


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
        # strides are not shape-derivable either: assume the family-standard
        # prefix (5,2,2,...), extending with 2s for extra layers — assumed
        # values are surfaced by cli/import_checkpoint.py (--conv_stride
        # overrides); wrong strides change frame geometry, not tensor shapes
        conv_stride=(base.audio.conv_stride[:len(conv_kernels)]
                     + (2,) * max(0, len(conv_kernels)
                                  - len(base.audio.conv_stride))),
        conv_bias="feature_extractor.conv_layers.0.conv.bias" in a_bb,
        hidden_size=ah, num_hidden_layers=n_audio_layers,
        num_attention_heads=_snap_heads(ah, base.audio.hidden_size,
                                        base.audio.num_attention_heads),
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
        num_attention_heads=_snap_heads(th, base.text.hidden_size,
                                        base.text.num_attention_heads),
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
    # key-prefix consumption ledger: anything in the encoder state_dicts not
    # under a consumed prefix is reported as skipped (dead or unmappable)
    a_used = ["encoder.", "adapter."]
    t_used = ["encoder.", "adapter."]

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
            a_used.append(f"{ref_name}.")
    if "asr_fusion.0.weight" in t_sd:
        put("asr_fusion", {"lin": _lin(t_sd, "asr_fusion.0")})
        t_used.append("asr_fusion.")
    if ("quality_proj" in init_params
            and "quality_gates.quality_projection.0.weight" in a_sd):
        put("quality_proj", _proj(a_sd, "quality_gates.quality_projection"))
        a_used.append("quality_gates.quality_projection.")
    if ("cond_proj" in init_params
            and "audio_conditioning.conditioning_projection.0.weight" in a_sd):
        put("cond_proj",
            _proj(a_sd, "audio_conditioning.conditioning_projection"))
        a_used.append("audio_conditioning.conditioning_projection.")
    if "asr_integration.asr_projection.0.weight" in t_sd:
        put("asr_proj", _proj(t_sd, "asr_integration.asr_projection"))
        t_used.append("asr_integration.asr_projection.")

    left = sorted(set(init_params) - set(imported))
    # every reference tensor NOT consumed above — e.g. the dead internal
    # pool.* modules, and the sibling quality_fusion/conditioning_fusion
    # weights that are dead on the reference's own forward when
    # combined_fusion is active (audio_encoder.py:127-138)
    skipped = sorted(
        {f"audio_encoder.{k}" for k in a_sd
         if not any(k.startswith(p) for p in a_used)}
        | {f"text_encoder.{k}" for k in t_sd
           if not any(k.startswith(p) for p in t_used)}
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


# ---------------------------------------------------------------------------
# inverse direction: our tree -> reference torch state_dicts
# ---------------------------------------------------------------------------

def _t(x):
    import torch
    return torch.from_numpy(np.asarray(x, np.float32).copy())


def _lin_inv(dst: dict, prefix: str, p: Mapping) -> None:
    dst[f"{prefix}.weight"] = _t(np.asarray(p["kernel"], np.float32).T)
    if "bias" in p:
        dst[f"{prefix}.bias"] = _t(p["bias"])


def _ln_inv(dst: dict, prefix: str, p: Mapping) -> None:
    dst[f"{prefix}.weight"] = _t(p["scale"])
    dst[f"{prefix}.bias"] = _t(p["bias"])


def _mha_inv(dst: dict, prefix: str, p: Mapping) -> None:
    import torch
    w = torch.cat([_t(np.asarray(p[k]["kernel"], np.float32).T)
                   for k in ("q", "k", "v")], dim=0)
    b = torch.cat([_t(p[k]["bias"]) for k in ("q", "k", "v")], dim=0)
    dst[f"{prefix}.in_proj_weight"] = w
    dst[f"{prefix}.in_proj_bias"] = b
    _lin_inv(dst, f"{prefix}.out_proj", p["out"])


def _proj_inv(dst: dict, prefix: str, p: Mapping) -> None:
    _lin_inv(dst, f"{prefix}.0", p["lin1"])
    _lin_inv(dst, f"{prefix}.3", p["lin2"])


def _zero_linear(dst: dict, prefix: str, in_dim: int, out_dim: int) -> None:
    import torch
    dst[f"{prefix}.weight"] = torch.zeros(out_dim, in_dim)
    dst[f"{prefix}.bias"] = torch.zeros(out_dim)


def _dead_pool(dst: dict, hid: int) -> None:
    """The encoders' internal AttentiveStatsPooling is dead weight on every
    reference train/eval path (the live pools are the separate pool_a/
    pool_t modules) and has no counterpart in our tree — emit zeros so
    strict load succeeds without inventing values."""
    _zero_linear(dst, "pool.attention.0", hid, 128)
    _zero_linear(dst, "pool.attention.2", 128, 1)


def wav2vec2_to_hf(tree: Mapping, *, pos_conv_style: str = "parametrizations"
                   ) -> dict:
    """Inverse of wav2vec2_from_hf. pos_conv_style selects the weight-norm
    serialization of the positional conv — "parametrizations" (torch>=2.1
    parametrize API), "weight_norm" (legacy weight_g/weight_v), or "plain"
    (a plain .weight key; only loads into un-parametrized models)."""
    import torch
    sd: dict = {}
    layer_feat_norm = "ln" in tree["convs"][0]
    for i, c in enumerate(tree["convs"]):
        # lax 'WIO' [k, in, out] -> torch Conv1d [out, in, k]
        sd[f"feature_extractor.conv_layers.{i}.conv.weight"] = _t(
            np.transpose(np.asarray(c["kernel"], np.float32), (2, 1, 0)))
        if "bias" in c:
            sd[f"feature_extractor.conv_layers.{i}.conv.bias"] = _t(c["bias"])
        if layer_feat_norm:
            _ln_inv(sd, f"feature_extractor.conv_layers.{i}.layer_norm",
                    c["ln"])
    if not layer_feat_norm:
        _ln_inv(sd, "feature_extractor.conv_layers.0.layer_norm",
                tree["group_norm"])

    _ln_inv(sd, "feature_projection.layer_norm", tree["feat_proj"]["ln"])
    _lin_inv(sd, "feature_projection.projection", tree["feat_proj"]["proj"])

    w = np.transpose(np.asarray(tree["pos_conv"]["kernel"], np.float32),
                     (2, 1, 0))  # [H, in/groups, k]
    pre = "encoder.pos_conv_embed.conv"
    if pos_conv_style == "plain":
        sd[f"{pre}.weight"] = _t(w)
    else:
        # weight = g * v / ||v||; pick v = w, g = ||w|| (norm over dims 0,1)
        g = np.sqrt((w * w).sum(axis=(0, 1), keepdims=True))
        if pos_conv_style == "parametrizations":
            sd[f"{pre}.parametrizations.weight.original0"] = _t(g)
            sd[f"{pre}.parametrizations.weight.original1"] = _t(w)
        elif pos_conv_style == "weight_norm":
            sd[f"{pre}.weight_g"] = _t(g)
            sd[f"{pre}.weight_v"] = _t(w)
        else:
            raise ValueError(f"unknown pos_conv_style {pos_conv_style!r}")
    sd[f"{pre}.bias"] = _t(tree["pos_conv"]["bias"])

    _ln_inv(sd, "encoder.layer_norm", tree["encoder_ln"])
    sd["masked_spec_embed"] = _t(tree["masked_spec_embed"])

    stacked = tree["layers"]
    L = np.asarray(stacked["attn_ln"]["scale"]).shape[0]
    wavlm = "gru_lin" in stacked
    for i in range(L):
        layer = {k: (jax_tree_index(v, i)) for k, v in stacked.items()}
        pre = f"encoder.layers.{i}"
        _lin_inv(sd, f"{pre}.attention.q_proj", layer["q"])
        _lin_inv(sd, f"{pre}.attention.k_proj", layer["k"])
        _lin_inv(sd, f"{pre}.attention.v_proj", layer["v"])
        _lin_inv(sd, f"{pre}.attention.out_proj", layer["out"])
        _ln_inv(sd, f"{pre}.layer_norm", layer["attn_ln"])
        _lin_inv(sd, f"{pre}.feed_forward.intermediate_dense", layer["ffn_in"])
        _lin_inv(sd, f"{pre}.feed_forward.output_dense", layer["ffn_out"])
        _ln_inv(sd, f"{pre}.final_layer_norm", layer["final_ln"])
        if wavlm:
            _lin_inv(sd, f"{pre}.attention.gru_rel_pos_linear",
                     layer["gru_lin"])
            sd[f"{pre}.attention.gru_rel_pos_const"] = _t(
                np.asarray(layer["gru_const"], np.float32)
                .reshape(1, -1, 1, 1))
    if wavlm:
        sd["encoder.layers.0.attention.rel_attn_embed.weight"] = _t(
            tree["rel_attn_embed"])
    return sd


def xlmr_to_hf(tree: Mapping, *, include_pooler: bool = True) -> dict:
    """Inverse of xlmr_from_hf. include_pooler emits a zeroed pooler
    (XLMRobertaModel registers one by default; the reference TextEncoder
    only consumes last_hidden_state — text_encoder.py:55-57 — so the
    pooler weights never influence behavior)."""
    sd: dict = {}
    emb = tree["embeddings"]
    sd["embeddings.word_embeddings.weight"] = _t(emb["word"])
    sd["embeddings.position_embeddings.weight"] = _t(emb["position"])
    sd["embeddings.token_type_embeddings.weight"] = _t(emb["token_type"])
    _ln_inv(sd, "embeddings.LayerNorm", emb["ln"])
    stacked = tree["layers"]
    L = np.asarray(stacked["attn_ln"]["scale"]).shape[0]
    for i in range(L):
        layer = {k: jax_tree_index(v, i) for k, v in stacked.items()}
        pre = f"encoder.layer.{i}"
        _lin_inv(sd, f"{pre}.attention.self.query", layer["q"])
        _lin_inv(sd, f"{pre}.attention.self.key", layer["k"])
        _lin_inv(sd, f"{pre}.attention.self.value", layer["v"])
        _lin_inv(sd, f"{pre}.attention.output.dense", layer["out"])
        _ln_inv(sd, f"{pre}.attention.output.LayerNorm", layer["attn_ln"])
        _lin_inv(sd, f"{pre}.intermediate.dense", layer["ffn_in"])
        _lin_inv(sd, f"{pre}.output.dense", layer["ffn_out"])
        _ln_inv(sd, f"{pre}.output.LayerNorm", layer["final_ln"])
    if include_pooler:
        H = int(np.asarray(emb["word"]).shape[1])
        _zero_linear(sd, "pooler.dense", H, H)
    return sd


def jax_tree_index(subtree, i: int):
    """Index the stacked-layer axis of a nested dict of arrays."""
    if isinstance(subtree, Mapping):
        return {k: jax_tree_index(v, i) for k, v in subtree.items()}
    return np.asarray(subtree)[i]


def reference_state_dicts_from_params(params: Mapping, cfg, *,
                                      pos_conv_style: str = "parametrizations",
                                      include_pooler: bool = True) -> dict:
    """Our parameter tree -> the reference trainers' 8-state_dict layout
    (train.py:247-263), loadable with load_state_dict(strict=True) into
    the reference's own modules. Tensors the reference requires but our
    tree deliberately does not carry (the encoders' dead internal pools;
    the sibling fusion blocks that are dead when combined_fusion is
    active) are emitted as zeros — they never influence a reference
    forward. asr_proj is NOT emitted: the reference only materializes
    its lazy asr_integration module after construction, so a strict load
    of TextEncoder would reject the keys."""
    import torch

    a_sd = {f"encoder.{k}": v for k, v in
            wav2vec2_to_hf(params["audio_backbone"],
                           pos_conv_style=pos_conv_style).items()}
    _lin_inv(a_sd, "adapter.0", params["audio_adapter"]["down"])
    _lin_inv(a_sd, "adapter.2", params["audio_adapter"]["up"])
    _dead_pool(a_sd, cfg.audio_hidden)
    if "quality_proj" in params:
        _proj_inv(a_sd, "quality_gates.quality_projection",
                  params["quality_proj"])
    if "cond_proj" in params:
        _proj_inv(a_sd, "audio_conditioning.conditioning_projection",
                  params["cond_proj"])
    hid = cfg.audio_hidden
    if cfg.use_quality_gates and cfg.use_audio_conditioning:
        _lin_inv(a_sd, "combined_fusion.0", params["combined_fusion"]["lin"])
        _zero_linear(a_sd, "quality_fusion.0", hid + 8, hid)
        _zero_linear(a_sd, "conditioning_fusion.0", hid + 12, hid)
    elif cfg.use_quality_gates:
        _lin_inv(a_sd, "quality_fusion.0", params["quality_fusion"]["lin"])
    elif cfg.use_audio_conditioning:
        _lin_inv(a_sd, "conditioning_fusion.0",
                 params["conditioning_fusion"]["lin"])

    t_sd = {f"encoder.{k}": v for k, v in
            xlmr_to_hf(params["text_backbone"],
                       include_pooler=include_pooler).items()}
    _lin_inv(t_sd, "adapter.0", params["text_adapter"]["down"])
    _lin_inv(t_sd, "adapter.2", params["text_adapter"]["up"])
    _dead_pool(t_sd, cfg.text_hidden)
    _lin_inv(t_sd, "asr_fusion.0", params["asr_fusion"]["lin"])

    cross_sd: dict = {}
    cp = params["cross"]
    for name in ("q_a", "k_t", "v_t", "out_a", "q_t", "k_a", "v_a", "out_t"):
        _lin_inv(cross_sd, name, cp[name])
    _mha_inv(cross_sd, "attn_a", cp["attn_a"])
    _mha_inv(cross_sd, "attn_t", cp["attn_t"])
    _ln_inv(cross_sd, "norm_a", cp["norm_a"])
    _ln_inv(cross_sd, "norm_t", cp["norm_t"])

    def pool_sd(p):
        d: dict = {}
        _lin_inv(d, "attention.0", p["w1"])
        _lin_inv(d, "attention.2", p["w2"])
        return d

    fusion_sd: dict = {}
    fp = params["fusion"]
    for ours, ref in (("proj_a1", "proj_a.0"), ("proj_a2", "proj_a.3"),
                      ("proj_t1", "proj_t.0"), ("proj_t2", "proj_t.3"),
                      ("gate_a1", "gate_a.0"), ("gate_a2", "gate_a.2"),
                      ("gate_t1", "gate_t.0"), ("gate_t2", "gate_t.2")):
        _lin_inv(fusion_sd, ref, fp[ours])

    clf_sd: dict = {}
    c = params["classifier"]
    _lin_inv(clf_sd, "deep_classifier.input_projection.0", c["input_proj"])
    _ln_inv(clf_sd, "deep_classifier.input_projection.1", c["input_ln"])
    L = np.asarray(c["layers"]["ln_pre"]["scale"]).shape[0]
    for i in range(L):
        layer = jax_tree_index(c["layers"], i)
        _ln_inv(clf_sd, f"deep_classifier.layer_norms.{i}", layer["ln_pre"])
        blk = f"deep_classifier.residual_layers.{i}.block"
        _ln_inv(clf_sd, f"{blk}.0", layer["block_ln"])
        _lin_inv(clf_sd, f"{blk}.1", layer["block_lin1"])
        _lin_inv(clf_sd, f"{blk}.4", layer["block_lin2"])
    _lin_inv(clf_sd, "deep_classifier.output_projection.0", c["out_proj1"])
    _ln_inv(clf_sd, "deep_classifier.output_projection.1", c["out_ln"])
    _lin_inv(clf_sd, "deep_classifier.output_projection.4", c["out_proj2"])
    anc = c["anchor"]
    clf_sd["anchor_clustering.class_anchors"] = _t(anc["class_anchors"])
    _lin_inv(clf_sd, "anchor_clustering.anchor_projection.0",
             anc["projection"])
    _ln_inv(clf_sd, "anchor_clustering.anchor_projection.1", anc["proj_ln"])
    clf_sd["anchor_clustering.temperature"] = _t(anc["temperature"])
    _lin_inv(clf_sd, "uncertainty_head.0", c["uncertainty"]["lin1"])
    _lin_inv(clf_sd, "uncertainty_head.3", c["uncertainty"]["lin2"])
    wb = c["weibull"]
    clf_sd["weibull_alpha"] = _t(wb["alpha"])
    clf_sd["weibull_beta"] = _t(wb["beta"])
    clf_sd["weibull_tau"] = _t(wb["tau"])
    clf_sd["activation_vectors"] = _t(wb["activation_vectors"])

    return {
        "audio_encoder": a_sd,
        "text_encoder": t_sd,
        "cross": cross_sd,
        "pool_a": pool_sd(params["pool_a"]),
        "pool_t": pool_sd(params["pool_t"]),
        "fusion": fusion_sd,
        "classifier": clf_sd,
        "prototypes": {"prototypes": _t(params["prototypes"]["prototypes"])},
    }

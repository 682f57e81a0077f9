"""HuggingFace -> JAX parameter conversion.

Converts torch state_dicts of `Wav2Vec2Model` and `XLMRobertaModel`/
`RobertaModel` into the pytrees consumed by wav2vec2.py / xlmr.py. This is
the capability the reference gets from `from_pretrained`
(/root/reference/src/models/audio_encoder.py:13-14, text_encoder.py:11-12):
loading the frozen pretrained backbones. Works from either a live torch
module's state_dict or a dict of numpy arrays.

Backbone swaps: wav2vec2-large and HuBERT-Large (identical key layout:
feat_extract_norm="layer" per-conv LayerNorms + conv bias +
do_stable_layer_norm pre-LN encoder) convert directly through
`wav2vec2_from_hf`; set the matching flags on Wav2Vec2Config. WavLM
(rel_attn_embed on layer 0 + per-layer gru_rel_pos gate tensors) is
auto-detected from the state-dict keys and converts through the same
function; set gated_relpos_bias=True on Wav2Vec2Config
(config.wavlm_large_audio_config).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import jax.numpy as jnp

Array = np.ndarray


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _lin(sd: Mapping, prefix: str) -> dict:
    p = {"kernel": jnp.asarray(_np(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return p


def _ln(sd: Mapping, prefix: str) -> dict:
    return {"scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def _conv(sd: Mapping, prefix: str) -> dict:
    # torch Conv1d weight [out, in/groups, k] -> lax 'WIO' [k, in/groups, out]
    p = {"kernel": jnp.asarray(_np(sd[f"{prefix}.weight"]).transpose(2, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return p


def _pos_conv_weight(sd: Mapping, prefix: str) -> np.ndarray:
    """Materialize the weight-normed positional conv weight (dim=2)."""
    if f"{prefix}.weight" in sd:
        return _np(sd[f"{prefix}.weight"])
    if f"{prefix}.parametrizations.weight.original0" in sd:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
    else:
        g = _np(sd[f"{prefix}.weight_g"])
        v = _np(sd[f"{prefix}.weight_v"])
    norm = np.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _count(sd: Mapping, pattern: str) -> int:
    i = 0
    while pattern.format(i) in sd:
        i += 1
    return i


def wav2vec2_from_hf(state_dict: Mapping, num_layers: int | None = None,
                     num_convs: int | None = None) -> dict:
    """Works for both feature-extractor norm variants: base-style
    (feat_extract_norm="group": a single group norm on conv 0) and
    large/HuBERT-Large-style (feat_extract_norm="layer": per-conv channel
    LayerNorm + conv bias) — detected from the state-dict keys. The encoder
    layer weights are identical across do_stable_layer_norm modes (only the
    runtime block ordering differs, set via Wav2Vec2Config)."""
    sd = dict(state_dict)
    if num_convs is None:
        num_convs = _count(sd, "feature_extractor.conv_layers.{}.conv.weight")
    if num_layers is None:
        num_layers = _count(sd, "encoder.layers.{}.final_layer_norm.weight")

    # conv 0's "layer_norm" is the group norm in group mode; a per-conv LN on
    # layer >= 1 is unambiguous evidence of feat_extract_norm="layer"
    layer_feat_norm = "feature_extractor.conv_layers.1.layer_norm.weight" in sd

    convs = []
    for i in range(num_convs):
        c = _conv(sd, f"feature_extractor.conv_layers.{i}.conv")
        if layer_feat_norm:
            c["ln"] = _ln(sd, f"feature_extractor.conv_layers.{i}.layer_norm")
        convs.append(c)

    pos_w = _pos_conv_weight(sd, "encoder.pos_conv_embed.conv")
    pos_conv = {"kernel": jnp.asarray(pos_w.transpose(2, 1, 0)),
                "bias": jnp.asarray(_np(sd["encoder.pos_conv_embed.conv.bias"]))}

    # WavLM: layer 0 owns the relative-position-bias embedding; every layer
    # carries the GRU-style gate (modeling_wavlm.WavLMAttention)
    wavlm = "encoder.layers.0.attention.rel_attn_embed.weight" in sd

    def layer(i):
        pre = f"encoder.layers.{i}"
        p = {
            "q": _lin(sd, f"{pre}.attention.q_proj"),
            "k": _lin(sd, f"{pre}.attention.k_proj"),
            "v": _lin(sd, f"{pre}.attention.v_proj"),
            "out": _lin(sd, f"{pre}.attention.out_proj"),
            "attn_ln": _ln(sd, f"{pre}.layer_norm"),
            "ffn_in": _lin(sd, f"{pre}.feed_forward.intermediate_dense"),
            "ffn_out": _lin(sd, f"{pre}.feed_forward.output_dense"),
            "final_ln": _ln(sd, f"{pre}.final_layer_norm"),
        }
        if wavlm:
            p["gru_lin"] = _lin(sd, f"{pre}.attention.gru_rel_pos_linear")
            # torch shape (1, H, 1, 1) -> [H]
            p["gru_const"] = jnp.asarray(
                _np(sd[f"{pre}.attention.gru_rel_pos_const"]).reshape(-1))
        return p

    import jax
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[layer(i) for i in range(num_layers)])

    params = {
        "convs": convs,
        "feat_proj": {
            "ln": _ln(sd, "feature_projection.layer_norm"),
            "proj": _lin(sd, "feature_projection.projection"),
        },
        "pos_conv": pos_conv,
        "encoder_ln": _ln(sd, "encoder.layer_norm"),
        "layers": stacked,
    }
    if not layer_feat_norm:
        params["group_norm"] = _ln(sd, "feature_extractor.conv_layers.0.layer_norm")
    if wavlm:
        params["rel_attn_embed"] = jnp.asarray(
            _np(sd["encoder.layers.0.attention.rel_attn_embed.weight"]))
    if "masked_spec_embed" in sd:
        params["masked_spec_embed"] = jnp.asarray(_np(sd["masked_spec_embed"]))
    else:
        params["masked_spec_embed"] = jnp.zeros(
            (params["feat_proj"]["proj"]["kernel"].shape[1],), jnp.float32)
    return params


def xlmr_from_hf(state_dict: Mapping, num_layers: int | None = None) -> dict:
    sd = {k.removeprefix("roberta."): v for k, v in dict(state_dict).items()}
    if num_layers is None:
        num_layers = _count(sd, "encoder.layer.{}.output.LayerNorm.weight")

    emb = {
        "word": jnp.asarray(_np(sd["embeddings.word_embeddings.weight"])),
        "position": jnp.asarray(_np(sd["embeddings.position_embeddings.weight"])),
        "token_type": jnp.asarray(_np(sd["embeddings.token_type_embeddings.weight"])),
        "ln": _ln(sd, "embeddings.LayerNorm"),
    }

    def layer(i):
        pre = f"encoder.layer.{i}"
        return {
            "q": _lin(sd, f"{pre}.attention.self.query"),
            "k": _lin(sd, f"{pre}.attention.self.key"),
            "v": _lin(sd, f"{pre}.attention.self.value"),
            "out": _lin(sd, f"{pre}.attention.output.dense"),
            "attn_ln": _ln(sd, f"{pre}.attention.output.LayerNorm"),
            "ffn_in": _lin(sd, f"{pre}.intermediate.dense"),
            "ffn_out": _lin(sd, f"{pre}.output.dense"),
            "final_ln": _ln(sd, f"{pre}.output.LayerNorm"),
        }

    import jax
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[layer(i) for i in range(num_layers)])
    return {"embeddings": emb, "layers": stacked}

"""Sequence parallelism: ring attention over a sequence-sharded frame axis.

The reference has no parallelism of any kind (SURVEY.md §2.6/§5.7 — 30 s
audio ≈ 1499 wav2vec2 frames fits one device easily), so this module is a
forward-looking TPU-native capability, not a port: when sequences outgrow
a chip (longer audio, larger backbones), the frame axis of the wav2vec2
transformer shards over a mesh axis and attention runs as a KV ring —
each device holds its local query block and rotates the K/V (+key-mask)
blocks around the ring with `ppermute` (ICI neighbor exchange), folding
each visiting block into an online-softmax accumulator (the blockwise /
flash decomposition; same recurrence as ops/pallas_kernels.py's masked
flash kernel, here across devices instead of across VMEM tiles).

Per-frame ops (LN, FFN, residuals) shard trivially; only attention needs
communication, and the only collective is the P-step neighbor permute —
bandwidth-optimal: every device sees every KV block exactly once.

Scope: all three backbone attention variants — vanilla (wav2vec2/HuBERT)
and WavLM's gated bucketed relative position bias, whose bias block is
recomputed per ring step from global (query, key) indices so the dense
[H, S, S] bias never materializes. Deterministic (eval/frozen) path only:
dropout inside the ring is not threaded.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models import layers
from ..models import wav2vec2 as w2v
from ..models.wav2vec2 import Wav2Vec2Config
from .mesh import DATA_AXIS, MODEL_AXIS

Array = jax.Array


def _ring_attention(q: Array, k: Array, v: Array, kv_bias: Array,
                    axis_name: str,
                    relpos: Optional[dict] = None) -> Array:
    """Blockwise ring attention.

    q, k, v: [B, H, S_loc, D] (q pre-scaled); kv_bias: [B, 1, 1, S_loc]
    additive bias for the *local* key block (-inf on padded keys).
    Returns [B, H, S_loc, D] — exact softmax(q·kᵀ + bias)·v over the full
    (global) key axis, accumulated online as blocks rotate.

    relpos (WavLM): {'gate': [B,H,S_loc,1] per-query gate, 'embed':
    [num_buckets, H] shared table, 'num_buckets', 'max_distance'}. The
    gated bucketed bias (models/wav2vec2.py:relative_position_bias +
    the gate at _encoder_stack) depends only on global (query, key)
    indices, so each ring step recomputes its [H, S_loc, S_loc] block
    from the visiting key block's global offset — no bias rotation.
    """
    P_ = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    perm = [(j, (j + 1) % P_) for j in range(P_)]
    B, H, Sq, D = q.shape

    m0 = jnp.full((B, H, Sq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, H, Sq), jnp.float32)
    o0 = jnp.zeros((B, H, Sq, D), jnp.float32)

    def body(step, carry):
        m, l, o, kk, vv, bb = carry
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, kk).astype(jnp.float32) + bb
        if relpos is not None:
            # after `step` rotations the local buffer holds block (my-step)
            k0 = (jnp.mod(my - step, P_)) * Sq
            rel = (k0 + jnp.arange(Sq))[None, :] - (my * Sq + jnp.arange(Sq))[:, None]
            bucket = w2v._relative_positions_bucket(
                rel, relpos["num_buckets"], relpos["max_distance"])
            bias = jnp.transpose(
                relpos["embed"].astype(jnp.float32)[bucket], (2, 0, 1))
            logits = logits + relpos["gate"] * bias[None]
        m_new = jnp.maximum(m, logits.max(axis=-1))
        # a query row that has only seen masked keys so far has m_new=-inf;
        # exponentiate against 0 there so alpha and p come out 0, not NaN
        m_safe = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
        alpha = jnp.exp(m - m_safe)
        p = jnp.exp(logits - m_safe[..., None])
        l_new = l * alpha + p.sum(axis=-1)
        o_new = o * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vv.astype(jnp.float32))
        kk, vv, bb = jax.lax.ppermute((kk, vv, bb), axis_name, perm)
        return m_new, l_new, o_new, kk, vv, bb

    m, l, o, *_ = jax.lax.fori_loop(
        0, P_, body, (m0, l0, o0, k, v, kv_bias.astype(jnp.float32)))
    return (o / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


def _layer_forward_sp(layer: dict, cfg: Wav2Vec2Config, x: Array,
                      kv_bias: Array, axis_name: str,
                      rel_embed: Optional[Array] = None) -> Array:
    """One encoder layer with ring attention; x: [B, S_loc, E]."""
    H = cfg.num_attention_heads
    D = cfg.hidden_size // H
    scale = D ** -0.5

    def attention(xin):
        B, S, E = xin.shape
        q = (layers.linear(layer["q"], xin) * scale).reshape(B, S, H, D)
        k = layers.linear(layer["k"], xin).reshape(B, S, H, D)
        v = layers.linear(layer["v"], xin).reshape(B, S, H, D)
        relpos = None
        if rel_embed is not None:
            # per-(batch, head, query) gate from the attention input —
            # query-local, so computed once here and reused every ring step
            # (same formula as the dense stack, wav2vec2.py:312-323)
            proj = layers.linear(layer["gru_lin"], xin.reshape(B, S, H, D))
            proj = proj.reshape(B, S, H, 2, 4).sum(-1)
            ga, gb = jnp.split(
                jax.nn.sigmoid(proj.astype(jnp.float32)), 2, axis=-1)
            const = layer["gru_const"].astype(jnp.float32)
            gate = ga * (gb * const[None, None, :, None] - 1.0) + 2.0
            relpos = {"gate": jnp.transpose(gate, (0, 2, 1, 3)),
                      "embed": rel_embed,
                      "num_buckets": cfg.num_buckets,
                      "max_distance": cfg.max_bucket_distance}
        q, k, v = (jnp.transpose(t, (0, 2, 1, 3)) for t in (q, k, v))
        ctx = _ring_attention(q, k, v, kv_bias, axis_name, relpos)
        ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(B, S, E)
        return layers.linear(layer["out"], ctx)

    def ffn(xin):
        # layers.gelu, not a hardcoded variant: the dense _encoder_stack uses
        # the dtype-dependent GELU policy (tanh approx in bf16), and the
        # sequence-parallel stack must match it bit-for-bit in every dtype.
        f = layers.gelu(layers.linear(layer["ffn_in"], xin))
        return layers.linear(layer["ffn_out"], f)

    if cfg.do_stable_layer_norm:
        x = x + attention(layers.layer_norm(layer["attn_ln"], x,
                                            eps=cfg.layer_norm_eps))
        x = x + ffn(layers.layer_norm(layer["final_ln"], x,
                                      eps=cfg.layer_norm_eps))
    else:
        x = layers.layer_norm(layer["attn_ln"], x + attention(x),
                              eps=cfg.layer_norm_eps)
        x = layers.layer_norm(layer["final_ln"], x + ffn(x),
                              eps=cfg.layer_norm_eps)
    return x


def encoder_stack_sequence_parallel(
        stacked: dict, cfg: Wav2Vec2Config, h: Array, frame_mask: Array,
        mesh: Mesh, *, rel_attn_embed: Optional[Array] = None,
        seq_axis: str = MODEL_AXIS,
        batch_axis: Optional[str] = DATA_AXIS) -> Array:
    """Run the wav2vec2 transformer stack with the frame axis sharded.

    h: [B, S, E] hidden states (post feat-proj/pos-conv, pre encoder
    stack — wav2vec2_encode up to `_encoder_stack`); frame_mask: [B, S].
    S is zero-padded up to a multiple of the `seq_axis` size (padded frames
    masked out of attention), and the result sliced back. Matches the
    dense `_encoder_stack` on all valid frames (tests/test_parallel.py).

    WavLM (cfg.gated_relpos_bias): pass `rel_attn_embed`
    (params["rel_attn_embed"], [num_buckets, H]); each device derives its
    bias blocks from global indices per ring step — the [H, S, S] dense
    bias is never materialized, another win at long S.

    Deterministic path only (the frozen-backbone eval/train configuration).
    """
    assert (rel_attn_embed is not None) == bool(cfg.gated_relpos_bias), \
        "pass rel_attn_embed exactly when cfg.gated_relpos_bias is set"
    B, S, E = h.shape
    Pseq = mesh.shape[seq_axis]
    S_pad = -(-S // Pseq) * Pseq
    if S_pad != S:
        h = jnp.pad(h, [(0, 0), (0, S_pad - S), (0, 0)])
        frame_mask = jnp.pad(frame_mask, [(0, 0), (0, S_pad - S)])
    # additive key bias, sharded with the key blocks
    kv_bias = jnp.where(frame_mask[:, None, None, :] == 0, -jnp.inf, 0.0)

    bspec = batch_axis if batch_axis is not None else None
    in_specs = (P(), P(), P(bspec, seq_axis, None),
                P(bspec, None, None, seq_axis))
    out_spec = P(bspec, seq_axis, None)

    has_rel = rel_attn_embed is not None  # static: selects the layer variant

    @functools.partial(shard_map, mesh=mesh, in_specs=in_specs,
                       out_specs=out_spec, check_vma=False)
    def run(params, rel_embed, h_loc, bias_loc):
        def body(x, layer):
            return _layer_forward_sp(layer, cfg, x, bias_loc, seq_axis,
                                     rel_embed if has_rel else None), None
        out, _ = jax.lax.scan(body, h_loc, params)
        return out

    # shard_map in_specs are positional and fixed-arity; a zero-size dummy
    # stands in when there is no relpos table (vanilla wav2vec2/HuBERT)
    rel = rel_attn_embed if has_rel else jnp.zeros((0,), h.dtype)
    out = run(stacked, rel, h, kv_bias)
    return out[:, :S, :]

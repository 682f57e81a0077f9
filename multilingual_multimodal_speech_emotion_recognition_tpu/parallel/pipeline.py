"""Pipeline parallelism: the encoder stack staged over a mesh axis.

The reference has no parallelism of any kind (SURVEY.md §2.6); like
parallel/sequence.py this is a forward-looking TPU-native capability, not
a port. When a backbone's weights outgrow one chip (or one TP group), its
L transformer layers split into P contiguous *stages*, one per device
along a `pipe` mesh axis, and microbatches stream through the stages
GPipe-style: at step t, stage p processes microbatch t-p and hands its
activations to stage p+1 over ICI (`ppermute` neighbor exchange — the
canonical TPU pipelining pattern: the only communication is one
[mb, S, E] activation block to a ring neighbor per step).

SPMD formulation (runs identically on every device, jit-compiled once):
the step loop is a `lax.scan` of length M + P - 1 (M microbatches; P - 1
bubble steps); each device applies its own stage (a lax.scan over its
L/P layers — the SAME layer math as the dense stack, reusing
models/wav2vec2._encoder_stack) to its current activation buffer, then
the buffers rotate one hop. Bubble-step outputs are computed-and-masked
(data-independent control flow keeps XLA happy); the last stage
accumulates its valid outputs into the result buffer, replicated at the
end with one masked psum.

Differentiable end-to-end (scan + ppermute transpose cleanly), so it
drops into a training step; `remat_stage` recomputes stage activations
in the backward pass, bounding live memory to one microbatch per stage.
Deterministic (eval/frozen-backbone) path only, like the ring-attention
module: dropout keys are not threaded through stages.

Efficiency notes: the pipeline bubble wastes (P-1)/(M+P-1) of each
device's steps — pick num_microbatches >= ~4·P to amortize; per-frame
FLOPs and HBM traffic are otherwise identical to the dense stack, and
the psum epilogue costs one output-sized all-reduce on the pipe axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models import wav2vec2 as w2v
from ..models.wav2vec2 import Wav2Vec2Config
from .mesh import DATA_AXIS, MODEL_AXIS

Array = jax.Array


def encoder_stack_pipeline(
        stacked: dict, cfg: Wav2Vec2Config, h: Array, frame_mask: Array,
        mesh: Mesh, *, num_microbatches: int,
        rel_attn_embed: Optional[Array] = None,
        pipe_axis: str = MODEL_AXIS,
        batch_axis: Optional[str] = DATA_AXIS,
        remat_stage: bool = True) -> Array:
    """Run the wav2vec2 transformer stack pipelined over `pipe_axis`.

    h: [B, S, E] hidden states (post feat-proj/pos-conv, pre encoder
    stack — exactly `_encoder_stack`'s input); frame_mask: [B, S].
    B must divide by num_microbatches; the layer count by the pipe-axis
    size. Matches the dense `_encoder_stack` exactly (tests/test_parallel).

    WavLM (cfg.gated_relpos_bias): pass params["rel_attn_embed"]; the
    shared [H, S, S] bias is computed once and broadcast (S is NOT sharded
    here — compose with parallel/sequence.py when it must be).
    """
    assert (rel_attn_embed is not None) == bool(cfg.gated_relpos_bias), \
        "pass rel_attn_embed exactly when cfg.gated_relpos_bias is set"
    B, S, E = h.shape
    M = num_microbatches
    if B % M:
        raise ValueError(f"batch {B} not divisible by microbatches {M}")
    if batch_axis is not None and (B // M) % mesh.shape[batch_axis]:
        raise ValueError(
            f"per-microbatch rows {B // M} not divisible by the "
            f"'{batch_axis}' axis ({mesh.shape[batch_axis]}) — lower "
            "num_microbatches or pass batch_axis=None")
    Pn = mesh.shape[pipe_axis]
    L = jax.tree.leaves(stacked)[0].shape[0]
    if L % Pn:
        raise ValueError(f"{L} layers not divisible by {Pn} pipeline stages")

    # [P, L/P, ...] stage-major split of the stacked layer params
    staged = jax.tree.map(
        lambda x: x.reshape(Pn, L // Pn, *x.shape[1:]), stacked)
    x_mb = h.reshape(M, B // M, S, E)
    bias_mb = jnp.where(frame_mask.reshape(M, B // M, S)[:, :, None, None, :]
                        == 0, -jnp.inf, 0.0)
    pos_bias = (w2v.relative_position_bias(
        {"rel_attn_embed": rel_attn_embed}, cfg, S)
        if rel_attn_embed is not None else jnp.zeros((0,), h.dtype))
    has_rel = rel_attn_embed is not None  # static

    bspec = batch_axis if batch_axis is not None else None
    in_specs = (P(pipe_axis), P(None, bspec, None, None),
                P(None, bspec, None, None, None), P())
    out_specs = P(None, bspec, None, None)

    @functools.partial(shard_map, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    def run(stage_params, x, bias, pbias):
        my = jax.lax.axis_index(pipe_axis)
        stage = jax.tree.map(lambda a: a[0], stage_params)  # local [L/P, ...]

        def apply_stage(buf, b):
            return w2v._encoder_stack(stage, cfg, buf, b, dropout_key=None,
                                      deterministic=True, remat=False,
                                      pos_bias=pbias if has_rel else None)

        if remat_stage:
            apply_stage = jax.checkpoint(apply_stage)

        mb = x.shape[1]
        buf0 = jnp.zeros((mb, S, E), x.dtype)
        out0 = jnp.zeros_like(x)

        def step(carry, t):
            buf, out = carry
            # stage 0 injects microbatch t (bubble tail clamps, masked out
            # later); downstream stages use the rotated-in buffer
            inject = jax.lax.dynamic_index_in_dim(
                x, jnp.clip(t, 0, M - 1), keepdims=False)
            buf = jnp.where(my == 0, inject, buf)
            # this device processes microbatch t - my at step t
            idx = jnp.clip(t - my, 0, M - 1)
            b = jax.lax.dynamic_index_in_dim(bias, idx, keepdims=False)
            y = apply_stage(buf, b)
            valid = (my == Pn - 1) & (t - my >= 0) & (t - my < M)
            out = jnp.where(
                valid,
                jax.lax.dynamic_update_index_in_dim(out, y, idx, 0),
                out)
            # rotate activations one hop downstream (last stage's output
            # is dropped — it just landed in `out`)
            nxt = jax.lax.ppermute(y, pipe_axis,
                                   [(j, j + 1) for j in range(Pn - 1)])
            return (nxt, out), None

        (_, out), _ = jax.lax.scan(step, (buf0, out0),
                                   jnp.arange(M + Pn - 1))
        # only the last stage holds real outputs; replicate across the pipe
        # axis with one masked all-reduce (out_specs leave `pipe` unsharded)
        return jax.lax.psum(jnp.where(my == Pn - 1, out, 0.0), pipe_axis)

    out = run(staged, x_mb, bias_mb, pos_bias)
    return out.reshape(B, S, E)

"""Pallas TPU kernels for the hot fused ops.

Two kernels this round (SURVEY.md §2.6 Pallas targets):

residual_stack_pallas
    The 35-layer residual MLP head (classifier.py parity path:
    /root/reference/src/models/classifier.py:200-224). Per layer:
    y = LN_pre(h); h = y + Lin2(relu(Lin1(LN_block(y)))). XLA's scan keeps
    the activation in HBM between layers; here the [B, D] activation lives
    in VMEM scratch for the whole stack while per-layer weights stream in
    via the grid's BlockSpec pipeline (double-buffered automatically), so
    the only HBM traffic is the one-time weight read. Eval path (no
    dropout) — training keeps the scan (dropout RNG inside pallas is
    possible but not worth it for a frozen-dropout-free head).

attentive_stats_pooling_pallas
    Masked attentive-statistics pooling (pooling.py:15-28 parity): score
    MLP, masked softmax over time, weighted mean ‖ weighted std — one
    kernel per batch row block, one pass over the sequence, no [B, S]
    score round-trips to HBM.

Both kernels run in `interpret=True` mode off-TPU so the CPU test suite
exercises their numerics; `use_pallas()` gates the real lowering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LN_EPS = 1e-5
POOL_EPS = 1e-6


def use_pallas() -> bool:
    """Real lowering only on TPU backends."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _interpret() -> bool:
    return not use_pallas()


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# fused residual stack
# ---------------------------------------------------------------------------

def _ln(x, scale, bias):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + LN_EPS)
            * scale.astype(jnp.float32) + bias.astype(jnp.float32))


def _residual_stack_kernel(x_ref, lnp_s, lnp_b, lnb_s, lnb_b, w1, b1, w2, b2,
                           out_ref, act):
    """One grid step = one residual layer; activation persists in VMEM."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        act[:] = x_ref[:].astype(jnp.float32)

    h = act[:]
    y = _ln(h, lnp_s[0, 0], lnp_b[0, 0])
    b = _ln(y, lnb_s[0, 0], lnb_b[0, 0])
    b = jnp.maximum(
        jnp.dot(b, w1[0].astype(jnp.float32),
                preferred_element_type=jnp.float32) + b1[0, 0], 0.0)
    b = jnp.dot(b, w2[0].astype(jnp.float32),
                preferred_element_type=jnp.float32) + b2[0, 0]
    act[:] = y + b

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = act[:].astype(out_ref.dtype)


def residual_stack_pallas(stacked: dict, x: Array) -> Array:
    """Eval-path fused residual stack. stacked: the classifier's [L, ...]
    parameter stack; x: [B, D]. Matches models/classifier._residual_stack
    with deterministic=True."""
    L, D = stacked["block_lin1"]["kernel"].shape[:2]
    B = x.shape[0]
    Bp = _round_up(max(B, 8), 8)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))

    # per-layer vectors carried as [L, 1, D] so blocks match trailing dims
    vec = lambda v: v.reshape(L, 1, D)
    vspec = pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, D, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _residual_stack_kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((Bp, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vspec, vspec,    # ln_pre scale/bias
            vspec, vspec,    # block_ln scale/bias
            mspec, vspec,    # lin1
            mspec, vspec,    # lin2
        ],
        out_specs=pl.BlockSpec((Bp, D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((Bp, D), jnp.float32)],
        interpret=_interpret(),
    )(x,
      vec(stacked["ln_pre"]["scale"]), vec(stacked["ln_pre"]["bias"]),
      vec(stacked["block_ln"]["scale"]), vec(stacked["block_ln"]["bias"]),
      stacked["block_lin1"]["kernel"], vec(stacked["block_lin1"]["bias"]),
      stacked["block_lin2"]["kernel"], vec(stacked["block_lin2"]["bias"]))
    return out[:B]


# ---------------------------------------------------------------------------
# fused attentive-stats pooling
# ---------------------------------------------------------------------------

NEG_BIG = -1e30


def _pool_kernel(x_ref, mask_ref, w1, b1, w2, b2, out_ref,
                 m_acc, l_acc, s1_acc, s2_acc):
    """Online-softmax streaming over sequence tiles (flash-style): running
    max m, normalizer l, weighted sums s1=Σe·x and s2=Σe·x² rescale as the
    max updates; var = E[x²] − mean² (identical to Σattn(x−mean)² since the
    weights sum to 1)."""
    s = pl.program_id(1)

    x = x_ref[0].astype(jnp.float32)            # [St, D] (batch in grid 0)
    mask = mask_ref[0].astype(jnp.float32)      # [St, 1]
    h = jnp.tanh(jnp.dot(x, w1[:].astype(jnp.float32),
                         preferred_element_type=jnp.float32) + b1[0])
    sc = (jnp.dot(h, w2[:].astype(jnp.float32),
                  preferred_element_type=jnp.float32) + b2[0, 0])  # [St, 1]
    sc = jnp.where(mask == 0, NEG_BIG, sc)

    @pl.when(s == 0)
    def _():
        m_acc[0, 0] = NEG_BIG
        l_acc[0, 0] = 0.0
        s1_acc[:] = jnp.zeros_like(s1_acc)
        s2_acc[:] = jnp.zeros_like(s2_acc)

    m_old = m_acc[0, 0]
    m_new = jnp.maximum(m_old, jnp.max(sc, axis=0, keepdims=True)[0, 0])
    rescale = jnp.exp(m_old - m_new)
    e = jnp.exp(sc - m_new) * mask              # [St, 1]; masked frames 0
    m_acc[0, 0] = m_new
    l_acc[0, 0] = (l_acc[0, 0] * rescale
                   + jnp.sum(e, axis=0, keepdims=True)[0, 0])
    contract_seq = (((0,), (0,)), ((), ()))     # [St,1]·[St,D] -> [1,D]
    s1_acc[:] = s1_acc[:] * rescale + jax.lax.dot_general(
        e, x, dimension_numbers=contract_seq,
        preferred_element_type=jnp.float32)
    s2_acc[:] = s2_acc[:] * rescale + jax.lax.dot_general(
        e, x * x, dimension_numbers=contract_seq,
        preferred_element_type=jnp.float32)

    @pl.when(s == pl.num_programs(1) - 1)
    def _():
        l = jnp.maximum(l_acc[0, 0], 1e-30)
        mean = s1_acc[:] / l                   # [1, D]
        ex2 = s2_acc[:] / l
        std = jnp.sqrt(jnp.maximum(ex2 - mean * mean, 0.0) + POOL_EPS)
        out_ref[0] = jnp.concatenate([mean, std], axis=-1).astype(out_ref.dtype)


def attentive_stats_pooling_pallas(params: dict, x: Array, mask: Array,
                                   *, seq_tile: int = 128) -> Array:
    """x: [B, S, D], mask: [B, S] -> [B, 2D]. Matches
    ops/pooling.attentive_stats_pooling numerics (f32 softmax); streams the
    sequence in VMEM-sized tiles so 30 s × 768-d inputs fit on-chip."""
    B, S, D = x.shape
    H = params["w1"]["kernel"].shape[1]
    St = min(seq_tile, S)
    Sp = _round_up(S, St)
    if Sp != S:
        x = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, Sp - S)))
    mask3 = mask[..., None]  # trailing singleton satisfies TPU block tiling

    out = pl.pallas_call(
        _pool_kernel,
        grid=(B, Sp // St),
        in_specs=[
            pl.BlockSpec((1, St, D), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, St, 1), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 2 * D), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, 2 * D), x.dtype),
        scratch_shapes=[
            pltpu.SMEM((1, 1), jnp.float32),   # running max
            pltpu.SMEM((1, 1), jnp.float32),   # normalizer
            pltpu.VMEM((1, D), jnp.float32),   # Σ e·x
            pltpu.VMEM((1, D), jnp.float32),   # Σ e·x²
        ],
        interpret=_interpret(),
    )(x, mask3,
      params["w1"]["kernel"], params["w1"]["bias"].reshape(1, H),
      params["w2"]["kernel"], params["w2"]["bias"].reshape(1, 1))
    return out[:, 0, :]

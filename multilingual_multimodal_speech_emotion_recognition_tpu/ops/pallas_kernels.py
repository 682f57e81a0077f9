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
    score round-trips to HBM. Re-measured round 4 at the B=128 knee
    (scripts/tpu_flash_retry.py, f32): jnp/pallas ms = 6.0/9.2
    (B=128,S=199,D=768), 3.0/4.1 (B=256), 5.0/7.6 (B=128,S=1499) — XLA's
    fusion still wins and the bf16 kernel fails Mosaic compilation, so
    the jnp path stays the default.

flash_attention
    Masked flash attention (forward): blockwise online-softmax over KV
    tiles, never materializing the [Sq, Skv] score matrix in HBM. The
    KV-blockwise structure is what lets a future `sequence` mesh axis shard
    the frame dimension (SURVEY.md §5.7 extension note). NOT wired into the
    default model: at this model's scales (Dh=64, S≤1499) XLA's fused
    attention is faster on v5e — re-measured round 4 at the B=128 serving
    knee (scripts/tpu_flash_retry.py, bf16, 128-blocks): XLA/flash ms =
    4.6/56 (B=64,S=199,H=12), 6.7/110 (B=128,S=199), 13.8/217
    (B=256,S=199), 5.1/147 (B=128,S=199,H=16 wavlm-large), 5.3/237
    (B=8,S=1499), 65.8/3774 (B=128,S=1499) — the per-head Dh=64
    half-fills the lanes and the serial KV-tile loop loses to XLA's
    fused pipeline at every geometry; 256-blocks still trip the Mosaic
    VMEM accounting. Kept as tested infrastructure for long-context
    sharding, where avoiding the O(S²) HBM score materialization is the
    point.

All kernels run in `interpret=True` mode off-TPU so the CPU test suite
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


# ---------------------------------------------------------------------------
# masked flash attention (forward)
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, kvmask_ref, out_ref,
                  m_acc, l_acc, o_acc, *, scale):
    """grid = (BH, nQ, nK); online softmax across the KV grid dimension."""
    kb = pl.program_id(2)

    q = q_ref[0].astype(jnp.float32)          # [Bq, Dh]
    k = k_ref[0].astype(jnp.float32)          # [Bk, Dh]
    v = v_ref[0].astype(jnp.float32)          # [Bk, Dh]
    kvm = kvmask_ref[0].astype(jnp.float32)   # [Bk, 1]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [Bq, Bk]
    s = jnp.where(kvm[:, 0][None, :] == 0, NEG_BIG, s)

    @pl.when(kb == 0)
    def _():
        m_acc[:] = jnp.full_like(m_acc, NEG_BIG)
        l_acc[:] = jnp.zeros_like(l_acc)
        o_acc[:] = jnp.zeros_like(o_acc)

    m_old = m_acc[:]                                     # [Bq, 1]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
    rescale = jnp.exp(m_old - m_new)                     # [Bq, 1]
    p = jnp.exp(s - m_new)                               # [Bq, Bk]
    m_acc[:] = m_new
    l_acc[:] = l_acc[:] * rescale + jnp.sum(p, axis=-1, keepdims=True)
    o_acc[:] = o_acc[:] * rescale + jnp.dot(
        p, v, preferred_element_type=jnp.float32)

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        out_ref[0] = (o_acc[:] / jnp.maximum(l_acc[:], 1e-30)
                      ).astype(out_ref.dtype)


def flash_attention(q: Array, k: Array, v: Array, kv_mask: Array, *,
                    num_heads: int, block_q: int = 128,
                    block_k: int = 128) -> Array:
    """Masked multi-head attention, flash-style.

    q: [B, Sq, D], k/v: [B, Skv, D], kv_mask: [B, Skv] (1 valid / 0 pad).
    Returns [B, Sq, D]. Softmax in f32; fully-masked KV is the caller's
    responsibility (same contract as models/layers.mha).
    """
    B, Sq, D = q.shape
    Skv = k.shape[1]
    Dh = D // num_heads
    scale = 1.0 / (Dh ** 0.5)

    def split_heads(x, S):
        # [B, S, D] -> [B*H, S, Dh]
        return (x.reshape(B, S, num_heads, Dh).transpose(0, 2, 1, 3)
                .reshape(B * num_heads, S, Dh))

    qh = split_heads(q, Sq)
    kh = split_heads(k, Skv)
    vh = split_heads(v, Skv)
    maskh = jnp.repeat(kv_mask[:, None, :], num_heads, axis=1).reshape(
        B * num_heads, Skv, 1)

    Bq = min(block_q, Sq)
    Bk = min(block_k, Skv)
    Sqp, Skp = _round_up(Sq, Bq), _round_up(Skv, Bk)
    if Sqp != Sq:
        qh = jnp.pad(qh, ((0, 0), (0, Sqp - Sq), (0, 0)))
    if Skp != Skv:
        kh = jnp.pad(kh, ((0, 0), (0, Skp - Skv), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, Skp - Skv), (0, 0)))
        maskh = jnp.pad(maskh, ((0, 0), (0, Skp - Skv), (0, 0)))

    BH = B * num_heads
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid=(BH, Sqp // Bq, Skp // Bk),
        in_specs=[
            pl.BlockSpec((1, Bq, Dh), lambda bh, iq, ik: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bk, Dh), lambda bh, iq, ik: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bk, Dh), lambda bh, iq, ik: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bk, 1), lambda bh, iq, ik: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Bq, Dh), lambda bh, iq, ik: (bh, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Sqp, Dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((Bq, 1), jnp.float32),    # running max
            pltpu.VMEM((Bq, 1), jnp.float32),    # normalizer
            pltpu.VMEM((Bq, Dh), jnp.float32),   # output accumulator
        ],
        interpret=_interpret(),
    )(qh, kh, vh, maskh)

    out = out[:, :Sq, :]
    return (out.reshape(B, num_heads, Sq, Dh).transpose(0, 2, 1, 3)
            .reshape(B, Sq, D))


# ---------------------------------------------------------------------------
# fused wav2vec2 conv-extractor tail
# ---------------------------------------------------------------------------
#
# Layers 1-6 of the HF wav2vec2/hubert/wavlm feature encoder — kernels
# (3,3,3,3,2,2), all stride 2, uniform channels C — are ~31% of the
# flagship's FLOPs (19.5 GFLOP per 4 s utterance). This kernel runs the
# whole tail VMEM-resident per (batch row, time tile):
#
#   * the input arrives PAIR-FOLDED ([B, T/2, 2C], a free row-major
#     reshape), so each stride-2 conv is expressed as MXU matmuls:
#       k=3:  y[t] = P[t] @ [W0;W1] + P[t+1][:C] @ W2
#       k=2:  y[t] = P[t] @ [W0;W1]
#     with P the pair rows — no wasted FLOPs vs the true conv.
#   * the stride product of the tail is 64, so a tile of F7 final frames
#     needs exactly 64*F7 input frames plus a 15-frame receptive-field
#     spill; the spill is fetched through a second BlockSpec view onto the
#     next tile's first _TAIL_HALO frames (the array is padded so the last
#     tile's halo is in bounds).
#   * weights (one [6,2C,C] stack + one [4,C,C] stack, ~8.4 MB bf16 at
#     C=512) have constant index maps, so Pallas fetches them once and
#     keeps them VMEM-resident across the whole grid.
#
# Numerics vs the lax.conv path: each matmul accumulates f32 on the MXU
# and rounds to the activation dtype per matmul; the k=3 layers therefore
# round twice (Z1+Z2) where lax.conv rounds once — a ≤1-ulp bf16
# difference (tests bound it). GELU/LayerNorm policies are shared with
# models/layers.py (tanh-approx GELU in bf16, f32 LN moments).
#
# NOT wired into the default model — measured SLOWER than the lax.conv
# loop on v5e (whole extractor @ B=32/4 s bf16: 7.3 ms lax vs 14.0 ms
# fused, flat across f7=16/32/64; scripts/tpu_conv_tail_bench.py). XLA's
# conv path already achieves ~45% MXU with GELU fused into the epilogue
# and HBM traffic overlapped with compute — the extractor is compute/VPU-
# balanced, not memory-bound, so the VMEM residency buys nothing, while
# the kernel's per-tile MXU -> VPU(gelu) -> pair-fold chain is serial
# (~16 us/step: ~7.6 matmul + ~4 gelu + ~4 fold, probed per-component).
# Kept as tested infrastructure (opt-in via feature_encoder(allow_fused=
# True)); values match the lax path within bf16 rounding on hardware
# (max |err| 0.031 on outputs spanning ±2.8).

_TAIL_KERNELS = (3, 3, 3, 3, 2, 2)
_TAIL_STRIDE_PRODUCT = 64
_TAIL_SPILL = 15          # receptive-field frames beyond 64*F7
_TAIL_HALO = 32           # fetched halo frames (≥ spill, pair-even)


def _tail_row_plan(f7: int):
    """Per-layer (n_pairs_in, n_rows_out) row bookkeeping for one tile.
    Row counts follow conv arithmetic: a k=3/s=2 layer over 2n frames
    yields n-1 usable rows (the last pair lacks its +2 neighbour); a
    k=2/s=2 layer yields exactly n."""
    frames = f7 * _TAIL_STRIDE_PRODUCT + _TAIL_HALO
    plan = []
    for k in _TAIL_KERNELS:
        pairs = frames // 2
        out = pairs - 1 if k == 3 else pairs
        plan.append((pairs, out))
        frames = out if out % 2 == 0 else out - 1  # next fold needs even
    assert frames == f7, (f7, plan)
    return plan


def _conv_tail_kernel(x_ref, halo_ref, w01, w2, bias, ln_s, ln_b, out_ref,
                      *, f7: int, has_ln: bool, approx_gelu: bool,
                      ln_eps: float):
    C = out_ref.shape[-1]
    plan = _tail_row_plan(f7)
    y = jnp.concatenate([x_ref[0], halo_ref[0]], axis=0)   # [pairs, 2C]
    w2_idx = 0
    for i, k in enumerate(_TAIL_KERNELS):
        pairs, n_out = plan[i]
        z = jnp.dot(y, w01[i], preferred_element_type=jnp.float32)
        if k == 3:
            z2 = jnp.dot(y[:, :C], w2[w2_idx],
                         preferred_element_type=jnp.float32)
            z = z[:n_out] + z2[1:n_out + 1]
            w2_idx += 1
        z = z.astype(out_ref.dtype) + bias[i]               # [n_out, C]
        if has_ln:
            z = (_ln_eps(z, ln_s[i], ln_b[i], ln_eps)
                 .astype(out_ref.dtype))
        z = jax.nn.gelu(z, approximate=approx_gelu)
        if i < len(_TAIL_KERNELS) - 1:
            even = n_out if n_out % 2 == 0 else n_out - 1
            y = z[:even].reshape(even // 2, 2 * C)          # pair-fold
    out_ref[0] = z


def _ln_eps(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)
            * scale.astype(jnp.float32) + bias.astype(jnp.float32))


def conv_tail_supported(conv_kernel, conv_stride, conv_dim) -> bool:
    """True when the conv stack's tail matches the fused geometry: kernels
    (K0,3,3,3,3,2,2), strides (S0,2,2,2,2,2,2), uniform lane-aligned
    channels (the HF wav2vec2/hubert/wavlm base AND large extractors)."""
    return (tuple(conv_kernel[1:]) == _TAIL_KERNELS
            and all(s == 2 for s in conv_stride[1:])
            and len(set(conv_dim)) == 1
            and conv_dim[0] % 128 == 0)


def conv_tail_pallas(convs: list, x1: Array, *, has_ln: bool,
                     ln_eps: float = 1e-5, f7: int = 16) -> Array:
    """Fused conv layers 1..6 over the layer-0 output x1 [B, T1, C].
    convs: params["convs"] (list of {"kernel" [K,Cin,Cout], optional
    "bias" [Cout], optional "ln" {scale,bias}}); returns [B, T7, C] with
    T7 the exact conv arithmetic length (matching the lax.conv loop)."""
    B, T1, C = x1.shape
    dtype = x1.dtype
    approx_gelu = dtype == jnp.bfloat16

    # exact output length of the six stride-2 layers
    t = T1
    for k in _TAIL_KERNELS:
        t = (t - k) // 2 + 1
    T7 = t

    n_tiles = _cdiv(T7, f7)
    in_frames = f7 * _TAIL_STRIDE_PRODUCT
    T1p = n_tiles * in_frames + _TAIL_HALO
    # Conv floor-arithmetic allows T1 up to 64*T7 + 78, so T1 can EXCEED
    # T1p (when T7 divides f7 exactly and 33 <= T1 - 64*T7 <= 78). Those
    # trailing frames are never consumed by a valid output (the last one
    # needs x1 rows < 64*T7 + 16 <= T1p), so pad-then-slice handles both
    # directions.
    x1 = jnp.pad(x1, ((0, 0), (0, max(0, T1p - T1)), (0, 0)))[:, :T1p]
    xp = x1.reshape(B, T1p // 2, 2 * C)                    # free pair-fold

    w01 = jnp.stack([
        jnp.concatenate([c["kernel"][0], c["kernel"][1]], axis=0)
        for c in convs[1:]]).astype(dtype)                 # [6, 2C, C]
    w2 = jnp.stack([c["kernel"][2] for c in convs[1:5]]).astype(dtype)
    bias = jnp.stack([
        (c["bias"] if "bias" in c else jnp.zeros((C,), dtype))
        for c in convs[1:]]).astype(dtype).reshape(6, 1, C)
    if has_ln:
        ln_s = jnp.stack([c["ln"]["scale"] for c in convs[1:]]).reshape(
            6, 1, C)
        ln_b = jnp.stack([c["ln"]["bias"] for c in convs[1:]]).reshape(
            6, 1, C)
    else:
        ln_s = jnp.zeros((6, 1, C), dtype)
        ln_b = jnp.zeros((6, 1, C), dtype)

    pairs_in = in_frames // 2
    pairs_halo = _TAIL_HALO // 2
    const3 = lambda shape: pl.BlockSpec(shape, lambda b, i: (0, 0, 0),
                                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_conv_tail_kernel, f7=f7, has_ln=has_ln,
                          approx_gelu=approx_gelu, ln_eps=ln_eps),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, pairs_in, 2 * C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            # halo: first _TAIL_HALO frames of the NEXT tile, expressed as
            # a block of pairs_halo rows at block index (i+1)*ratio
            pl.BlockSpec((1, pairs_halo, 2 * C),
                         lambda b, i: (b, (i + 1) * (pairs_in // pairs_halo),
                                       0),
                         memory_space=pltpu.VMEM),
            const3((6, 2 * C, C)),
            const3((4, C, C)),
            const3((6, 1, C)),
            const3((6, 1, C)),
            const3((6, 1, C)),
        ],
        out_specs=pl.BlockSpec((1, f7, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * f7, C), dtype),
        compiler_params=pltpu.CompilerParams(
            # every (batch row, tile) is independent — let Mosaic pipeline
            # freely; raise the VMEM cap for the f7>=32 tile sizes (weights
            # 8.4 MB + double-buffered input blocks)
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(xp, xp, w01, w2, bias, ln_s, ln_b)
    return out[:, :T7]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)

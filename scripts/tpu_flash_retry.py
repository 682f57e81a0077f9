#!/usr/bin/env python3
"""Re-measure the Pallas flash-attention and pooling kernels at the B=128
serving knee (VERDICT r3 item 6).

The round-2 'launch-bound, XLA wins' verdicts in ops/pallas_kernels.py
were measured at B=8-64; the measured throughput knee moved to B=128
(docs/PERFORMANCE.md), where launch overhead amortizes differently. Times
XLA attention (the einsum form the encoder stacks compile to) vs
flash_attention, and jnp pooling vs attentive_stats_pooling_pallas, at
the flagship geometry (S=199 @ 4 s at the 320x conv stride; S=1499 @
30 s) and the wavlm-large head count.

Sync discipline: every benched function reduces its output to ONE scalar
inside the jit, and the timing loop fetches only that scalar — fetching
a full activation would ride the ~3 MB/s relay link and dominate the
measurement (CLAUDE.md).

TPU session only:  python scripts/tpu_flash_retry.py
"""

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WARMUP, ITERS = 2, 10


def timed(fn, *args):
    """fn must return a SCALAR device array."""
    for _ in range(WARMUP):
        out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)           # drain the dispatch queue, fetch 4 bytes
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from multilingual_multimodal_speech_emotion_recognition_tpu.ops import (
        pallas_kernels as pk, pooling as pool_ops)

    rng = np.random.default_rng(0)

    def xla_attn(q, k, v, mask, num_heads):
        B, S, D = q.shape
        Dh = D // num_heads
        qh = q.reshape(B, S, num_heads, Dh)
        kh = k.reshape(B, S, num_heads, Dh)
        vh = v.reshape(B, S, num_heads, Dh)
        s = (jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32)
             / np.sqrt(Dh))
        s = jnp.where(mask[:, None, None, :] > 0, s, -1e30)
        a = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", a, vh).reshape(B, S, D)
        return jnp.sum(out.astype(jnp.float32))

    for B, S, H in ((64, 199, 12), (128, 199, 12), (256, 199, 12),
                    (128, 199, 16),      # wavlm-large heads @ 4 s
                    (8, 1499, 12), (64, 1499, 12), (128, 1499, 12)):
        D = 64 * H
        q = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
        mask = jnp.ones((B, S), jnp.float32)
        t_xla = timed(jax.jit(functools.partial(xla_attn, num_heads=H)),
                      q, k, v, mask)
        row = {"kind": "attention", "B": B, "S": S, "H": H,
               "xla_ms": round(t_xla, 3)}
        for blk in (128, 256):
            try:
                f = jax.jit(lambda q, k, v, m, blk=blk: jnp.sum(
                    pk.flash_attention(q, k, v, m, num_heads=H,
                                       block_q=min(blk, S),
                                       block_k=min(blk, S))
                    .astype(jnp.float32)))
                row[f"flash{blk}_ms"] = round(timed(f, q, k, v, mask), 3)
            except Exception as e:
                row[f"flash{blk}_ms"] = f"{type(e).__name__}: {str(e)[:60]}"
        print(json.dumps(row), flush=True)

    for B, S, D in ((64, 199, 768), (128, 199, 768), (256, 199, 768),
                    (128, 1499, 768)):
        for dtype in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.standard_normal((B, S, D)), dtype)
            mask = jnp.ones((B, S), jnp.float32)
            p = {"w1": {"kernel": jnp.asarray(
                rng.standard_normal((D, 128)) * 0.05, dtype),
                "bias": jnp.zeros((128,), dtype)},
                "w2": {"kernel": jnp.asarray(
                    rng.standard_normal((128, 1)) * 0.05, dtype),
                    "bias": jnp.zeros((1,), dtype)}}
            t_jnp = timed(jax.jit(lambda p, x, m: jnp.sum(
                pool_ops.attentive_stats_pooling(p, x, m)
                .astype(jnp.float32))), p, x, mask)
            row = {"kind": "pooling", "B": B, "S": S,
                   "dtype": np.dtype(dtype).name, "jnp_ms": round(t_jnp, 3)}
            try:
                t_pl = timed(jax.jit(lambda p, x, m: jnp.sum(
                    pk.attentive_stats_pooling_pallas(p, x, m)
                    .astype(jnp.float32))), p, x, mask)
                row["pallas_ms"] = round(t_pl, 3)
            except Exception as e:
                row["pallas_ms"] = f"{type(e).__name__}: {str(e)[:60]}"
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

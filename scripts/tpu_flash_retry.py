#!/usr/bin/env python3
"""Re-measure the Pallas flash-attention and pooling kernels at the B=128
serving knee (VERDICT r3 item 6).

The round-2 'launch-bound, XLA wins' verdicts in ops/pallas_kernels.py
were measured at B=8-64; the measured throughput knee moved to B=128
(docs/PERFORMANCE.md), where launch overhead amortizes differently. Times
XLA's fused attention vs flash_attention and the jnp pooling vs
attentive_stats_pooling_pallas at the flagship geometry (S=199 @ 4 s for
the 320x conv stride... S=1499 is the 30 s bucket) and both block sizes.

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
    import jax
    for _ in range(WARMUP):
        np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[:1]
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from multilingual_multimodal_speech_emotion_recognition_tpu.ops import (
        pallas_kernels as pk, pooling as pool_ops)

    rng = np.random.default_rng(0)

    def xla_attn(q, k, v, mask):
        Dh = q.shape[-1]
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(Dh)
        s = jnp.where(mask[:, None, None, :] > 0, s, -1e30)
        return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)

    for B, S, H in ((64, 199, 12), (128, 199, 12), (256, 199, 12),
                    (128, 199, 16),      # wavlm-large geometry @ 4 s
                    (8, 1499, 12), (64, 1499, 12), (128, 1499, 12)):
        Dh = 64
        q = jnp.asarray(rng.standard_normal((B, H, S, Dh)),
                        jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, S, Dh)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, S, Dh)), jnp.bfloat16)
        mask = jnp.ones((B, S), jnp.float32)
        t_xla = timed(jax.jit(xla_attn), q, k, v, mask)
        row = {"kind": "attention", "B": B, "S": S, "H": H,
               "xla_ms": round(t_xla, 3)}
        for blk in (128, 256):
            try:
                f = jax.jit(functools.partial(pk.flash_attention,
                                              block_q=min(blk, S),
                                              block_kv=min(blk, S)))
                row[f"flash{blk}_ms"] = round(timed(f, q, k, v, mask), 3)
            except Exception as e:
                row[f"flash{blk}_ms"] = f"{type(e).__name__}"
        print(json.dumps(row), flush=True)

    for B, S, D in ((64, 199, 768), (128, 199, 768), (256, 199, 768),
                    (128, 1499, 768)):
        x = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
        mask = jnp.ones((B, S), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((D, 128)) * 0.05, jnp.bfloat16)
        b1 = jnp.zeros((128,), jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((128, 1)) * 0.05, jnp.bfloat16)
        b2 = jnp.zeros((1,), jnp.bfloat16)
        p = {"w1": {"kernel": w1, "bias": b1}, "w2": {"kernel": w2, "bias": b2}}
        t_jnp = timed(jax.jit(pool_ops.attentive_stats_pooling), p, x, mask)
        row = {"kind": "pooling", "B": B, "S": S, "D": D,
               "jnp_ms": round(t_jnp, 3)}
        try:
            t_pl = timed(jax.jit(pk.attentive_stats_pooling_pallas), p, x,
                         mask)
            row["pallas_ms"] = round(t_pl, 3)
        except Exception as e:
            row["pallas_ms"] = type(e).__name__
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

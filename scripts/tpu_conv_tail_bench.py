#!/usr/bin/env python3
"""Measure the fused Pallas conv-extractor tail vs the lax.conv loop on the
real TPU (v5e). The tail (wav2vec2 conv layers 1-6) is ~31% of the
flagship's FLOPs; the hypothesis is that six separate lax.convs with
HBM-materialized activations run far below MXU peak while the fused
VMEM-resident kernel approaches it.

Relay rules (CLAUDE.md): params passed as jit ARGUMENTS (no baked
constants), sync via np.asarray of a tiny output.
"""

import argparse
import time

import numpy as np


def timed(fn, *args, iters=10, warmup=2):
    import jax
    for _ in range(warmup):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[32, 128])
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--f7", type=int, default=0,
                    help="override the kernel's final-frames-per-tile")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
        Wav2Vec2Config)
    from multilingual_multimodal_speech_emotion_recognition_tpu.models import (
        wav2vec2 as w2v)
    from multilingual_multimodal_speech_emotion_recognition_tpu.ops import (
        pallas_kernels as pk)

    cfg = Wav2Vec2Config()  # base: conv_dim 512x7, (10,3,3,3,3,2,2)
    key = jax.random.key(0)
    params = w2v.init_wav2vec2(key, cfg)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)

    if args.f7:
        import functools
        orig = pk.conv_tail_pallas
        pk.conv_tail_pallas = functools.partial(orig, f7=args.f7)

    T = int(args.seconds * 16000)
    for B in args.batch:
        rng = np.random.default_rng(0)
        wave = jnp.asarray(
            rng.standard_normal((B, T)).astype(np.float32) * 0.1
        ).astype(jnp.bfloat16)
        mask = jnp.ones((B, T), jnp.float32)

        @jax.jit
        def fe_fused(p, w, m):
            x, fm = w2v.feature_encoder(p, cfg, w, m, allow_fused=True)
            return x.astype(jnp.float32).sum()

        @jax.jit
        def fe_lax(p, w, m):
            x, fm = w2v.feature_encoder(p, cfg, w, m, allow_fused=False)
            return x.astype(jnp.float32).sum()

        ms_lax = timed(fe_lax, params, wave, mask)
        ms_fused = timed(fe_fused, params, wave, mask)

        # value check reduced ON DEVICE (fetching [B,T7,C] twice over the
        # ~3 MB/s relay link would add ~30 s per batch size)
        @jax.jit
        def max_abs_dev(p, w, m):
            a, _ = w2v.feature_encoder(p, cfg, w, m, allow_fused=True)
            b, _ = w2v.feature_encoder(p, cfg, w, m, allow_fused=False)
            return jnp.max(jnp.abs(a.astype(jnp.float32)
                                   - b.astype(jnp.float32)))

        err = float(np.asarray(max_abs_dev(params, wave, mask)))

        # tail FLOPs (layers 1-6) for MXU-efficiency context
        t1 = (T - 10) // 5 + 1
        flops = 0
        t = t1
        for k in (3, 3, 3, 3, 2, 2):
            t = (t - k) // 2 + 1
            flops += t * k * 512 * 512 * 2
        print(f"B={B}: lax={ms_lax:.2f} ms  fused={ms_fused:.2f} ms  "
              f"speedup={ms_lax / ms_fused:.2f}x  max_abs_err={err:.4f}  "
              f"tail={B * flops / 1e9:.1f} GFLOP -> "
              f"{B * flops / (ms_fused * 1e-3) / 1e12:.1f} TFLOP/s fused "
              f"(whole-extractor time incl. layer 0)")


if __name__ == "__main__":
    main()

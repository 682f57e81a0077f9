#!/usr/bin/env python3
"""Train-step throughput vs batch size on the real TPU (flagship model).

Round-3 frozen-backbone train step at B=16: 28.3 ms with the rbg PRNG
(docs/PERFORMANCE.md); larger batches amortize launch overhead and fill
the MXU better. Times the jitted train step at B in {16, 32, 64} for both input
modes — precomputed front-end feats (the offline-features pipeline) and
in-step device DSP (the default pipeline) — and with backbones unfrozen
at B=16 for the fine-tuning configuration.

Run on the TPU session only (one TPU job at a time):
    python scripts/tpu_train_throughput.py
Prints one JSON line per row; paste into PARITY.md when it changes a
quoted number.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SECONDS = 4.0
TEXT_TOKENS = 32
WARMUP = 2
ITERS = 5


def main():
    import jax
    # the cli/train.py default: rbg PRNG for the dropout masks
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
        ModelConfig, TrainConfig)
    from multilingual_multimodal_speech_emotion_recognition_tpu.models import (
        model as mdl)
    from multilingual_multimodal_speech_emotion_recognition_tpu.train import (
        optimizer as opt_lib, train_step as ts)

    cfg = ModelConfig(compute_dtype="bfloat16")
    params = mdl.init_model(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    T = int(SECONDS * 16000)

    def make_batch(B, precomputed_feats):
        lengths = rng.integers(int(0.6 * T), T, B)
        b = {
            "audio": jnp.asarray(
                rng.standard_normal((B, T)).astype(np.float32) * 0.1),
            "audio_mask": jnp.asarray(
                (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)),
            "text_ids": jnp.asarray(rng.integers(
                2, cfg.text.vocab_size, (B, TEXT_TOKENS)).astype(np.int32)),
            "text_mask": jnp.ones((B, TEXT_TOKENS), jnp.float32),
            "labels": jnp.asarray(rng.integers(0, cfg.num_labels, B)),
        }
        if precomputed_feats:
            b["quality_feats"] = jnp.zeros((B, 8), jnp.float32)
            b["cond_feats"] = jnp.zeros((B, 12), jnp.float32)
        return b

    def timed(fn, *args):
        for _ in range(WARMUP):
            np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[:1]
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        return (time.perf_counter() - t0) / ITERS

    def bench(B, *, precomputed, freeze, remat=True, accum=1,
              moment_dtype=None):
        import dataclasses
        mcfg = dataclasses.replace(cfg, remat_encoders=remat)
        tcfg = TrainConfig(augment=False, freeze_backbones=freeze,
                           grad_accum=accum)
        tx = opt_lib.make_train_optimizer(
            params, lr=2e-4, total_steps=100, freeze_backbones=freeze,
            backbone_moment_dtype=(jnp.dtype(moment_dtype)
                                   if moment_dtype else None))
        opt_state = tx.init(params)
        step = ts.make_train_step(mcfg, tcfg, tx, donate=False)
        batch = make_batch(B, precomputed)
        key = jax.random.key(1)
        try:
            dt = timed(lambda p, s: step(p, s, batch, key), params, opt_state)
        except Exception as e:  # XlaRuntimeError: RESOURCE_EXHAUSTED etc.
            print(json.dumps({"batch": B, "frozen_backbones": freeze,
                              "remat": str(remat), "grad_accum": accum,
                              "moment_dtype": moment_dtype,
                              "error": type(e).__name__,
                              "msg": str(e)[:120]}), flush=True)
            return
        row = {"batch": B,
               "feats": "precomputed" if precomputed else "in-step DSP",
               "frozen_backbones": freeze, "remat": str(remat),
               "grad_accum": accum, "moment_dtype": moment_dtype,
               "step_ms": round(dt * 1e3, 2),
               "utt_per_sec": round(B / dt, 1),
               "clip_seconds": SECONDS}
        print(json.dumps(row), flush=True)

    if "--unfrozen" in sys.argv:
        # VERDICT r3 item 4: the phase-2 fine-tune configuration — sweep
        # batch x remat policy to find the knee and the best policy for
        # the --two_phase default (models/remat.py). An OOM can leave the
        # relay-backed TPU client unusable for the rest of the process
        # (observed: the B=128 full-remat OOM killed the run), so select
        # policies/batches via flags and run risky points LAST or alone:
        #   --policies full,dots,none   --batches 16,32,64,128
        pol_arg = next((a.split("=", 1)[1] for a in sys.argv
                        if a.startswith("--policies=")), "full,dots,none")
        b_arg = next((a.split("=", 1)[1] for a in sys.argv
                      if a.startswith("--batches=")), "16,32,64")
        # VERDICT r4 item 8 memory levers: --accums=1,2 splits each batch
        # into microbatches (effective batch unchanged); --moments=bf16
        # stores backbone AdamW mu in bf16 (train/optimizer.py)
        a_arg = next((a.split("=", 1)[1] for a in sys.argv
                      if a.startswith("--accums=")), "1")
        m_arg = next((a.split("=", 1)[1] for a in sys.argv
                      if a.startswith("--moments=")), "f32")
        pol_map = {"full": True, "dots": "dots", "none": False}
        mom_map = {"f32": None, "bf16": "bfloat16"}
        for pol in pol_arg.split(","):
            for acc in (int(x) for x in a_arg.split(",")):
                for mom in m_arg.split(","):
                    for B in (int(x) for x in b_arg.split(",")):
                        bench(B, precomputed=True, freeze=False,
                              remat=pol_map[pol], accum=acc,
                              moment_dtype=mom_map[mom])
        return

    for B in (16, 32, 64, 128):
        bench(B, precomputed=True, freeze=True)
    for B in (16, 32, 64, 128):
        bench(B, precomputed=False, freeze=True)
    bench(16, precomputed=True, freeze=False)


if __name__ == "__main__":
    main()

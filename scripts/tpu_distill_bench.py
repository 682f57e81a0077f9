#!/usr/bin/env python3
"""Measure the distillation path on the real TPU: the small student's
serving forward (the cascade first tier) and the one-jit distill step
(teacher inference fused with the student update).

Relay rules: params as jit arguments, sync via a scalar fetch.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SECONDS = 4.0
TEXT_TOKENS = 32


def timed(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
        ModelConfig, TrainConfig)
    from multilingual_multimodal_speech_emotion_recognition_tpu.models import (
        model as mdl)
    from multilingual_multimodal_speech_emotion_recognition_tpu.train import (
        distill as dst, optimizer as opt_lib)

    teacher_cfg = ModelConfig(compute_dtype="bfloat16")
    student_cfg = dst.student_model_config(teacher_cfg, "small")
    teacher = mdl.init_model(jax.random.key(0), teacher_cfg)
    student = mdl.init_model(jax.random.key(1), student_cfg)

    T = int(SECONDS * 16000)
    rng = np.random.default_rng(0)

    def batch(B, with_labels=False):
        b = {
            "audio": jnp.asarray(
                rng.standard_normal((B, T)).astype(np.float32) * 0.1),
            "audio_mask": jnp.ones((B, T), jnp.float32),
            "text_ids": jnp.asarray(rng.integers(
                2, teacher_cfg.text.vocab_size,
                (B, TEXT_TOKENS)).astype(np.int32)),
            "text_mask": jnp.ones((B, TEXT_TOKENS), jnp.float32),
            "quality_feats": jnp.zeros((B, 8), jnp.float32),
            "cond_feats": jnp.zeros((B, 12), jnp.float32),
        }
        if with_labels:
            b["labels"] = jnp.asarray(
                rng.integers(0, 4, (B,)).astype(np.int32))
        return b

    res = {}
    B = 128
    fwd = lambda cfg: jax.jit(lambda p, b: mdl.model_forward(
        p, cfg, b, deterministic=True).logits.sum())
    eb = batch(B)
    ms_t = timed(fwd(teacher_cfg), teacher, eb)
    ms_s = timed(fwd(student_cfg), student, eb)
    res["teacher_fwd_b128_ms"] = round(ms_t, 2)
    res["student_fwd_b128_ms"] = round(ms_s, 2)
    res["student_speedup"] = round(ms_t / ms_s, 2)
    res["student_utt_per_sec"] = round(B / ms_s * 1e3, 1)

    Bd = 32
    tcfg = TrainConfig(batch_size=Bd)
    dcfg = dst.DistillConfig()
    tx = opt_lib.make_train_optimizer(
        student, lr=3e-4, total_steps=1000, freeze_backbones=False)
    opt_state = tx.init(student)
    step = dst.make_distill_step(teacher_cfg, student_cfg, tcfg, dcfg, tx)
    db = batch(Bd, with_labels=True)
    key = jax.random.key(2)

    p, o = student, opt_state
    # donation: rebind on every call (holding old refs forces copies)
    p, o, aux = step(p, teacher, o, db, key)
    np.asarray(aux["loss"])
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        p, o, aux = step(p, teacher, o, db, key)
    np.asarray(aux["loss"])
    ms = (time.perf_counter() - t0) / iters * 1e3
    res["distill_step_b32_ms"] = round(ms, 2)
    res["distill_utt_per_sec"] = round(Bd / ms * 1e3, 1)
    res.update(batch_fwd=B, batch_distill=Bd, clip_seconds=SECONDS)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

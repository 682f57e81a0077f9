#!/usr/bin/env python3
"""Real-TPU validation of the large-backbone family (verdict r2 item 3).

For each of wav2vec2-large / hubert-large / wavlm-large (stable pre-LN,
layer-norm conv stack, and — for WavLM — the gated bucketed relative
position bias, exactly the paths that work interpreted but can trip
Mosaic/XLA on hardware): lower + time one eval forward (B=32, 4 s, bf16)
and one frozen-backbone train step (B=16), plus an int8-quantized forward
on the real wavlm-large tree (not a "Large-shaped" stand-in).

Run on the TPU session only (one TPU job at a time):
    python scripts/tpu_large_backbones.py [--presets wavlm-large ...]

Prints one JSON line per preset; paste results into PARITY.md.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SECONDS = 4.0
TEXT_TOKENS = 32
EVAL_B = 32
TRAIN_B = 16
WARMUP = 2
ITERS = 5

PRESETS = ("wav2vec2-large", "hubert-large", "wavlm-large")


def bench_preset(name: str, *, int8: bool = False):
    import jax
    import jax.numpy as jnp

    from multilingual_multimodal_speech_emotion_recognition_tpu import config as cfg_lib
    from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
        ModelConfig, TrainConfig)
    from multilingual_multimodal_speech_emotion_recognition_tpu.eval import (
        benchmark as bm)
    from multilingual_multimodal_speech_emotion_recognition_tpu.models import (
        model as mdl)
    from multilingual_multimodal_speech_emotion_recognition_tpu.train import (
        optimizer as opt_lib, train_step as ts)

    audio_cfg = {
        "wav2vec2-large": cfg_lib.wav2vec2_large_audio_config,
        "hubert-large": cfg_lib.hubert_large_audio_config,
        "wavlm-large": cfg_lib.wavlm_large_audio_config,
    }[name]()
    cfg = ModelConfig(audio=audio_cfg, compute_dtype="bfloat16")
    params = mdl.init_model(jax.random.key(0), cfg)

    rng = np.random.default_rng(0)
    T = int(SECONDS * 16000)

    def make_batch(B, with_labels):
        lengths = rng.integers(int(0.6 * T), T, B)
        b = {
            "audio": jnp.asarray(
                rng.standard_normal((B, T)).astype(np.float32) * 0.1),
            "audio_mask": jnp.asarray(
                (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)),
            "text_ids": jnp.asarray(rng.integers(
                2, cfg.text.vocab_size, (B, TEXT_TOKENS)).astype(np.int32)),
            "text_mask": jnp.ones((B, TEXT_TOKENS), jnp.float32),
            "quality_feats": jnp.zeros((B, 8), jnp.float32),
            "cond_feats": jnp.zeros((B, 12), jnp.float32),
        }
        if with_labels:
            b["labels"] = jnp.asarray(rng.integers(0, cfg.num_labels, B))
        return b

    import jax

    @jax.jit
    def fwd(p, batch):
        return mdl.model_forward(p, cfg, batch, deterministic=True).logits

    def timed(fn, *args):
        for _ in range(WARMUP):
            np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[:1]
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        return (time.perf_counter() - t0) / ITERS

    eval_batch = make_batch(EVAL_B, False)
    t_c0 = time.perf_counter()
    dt_fwd = timed(fwd, params, eval_batch)
    compile_s = time.perf_counter() - t_c0

    # frozen-backbone train step (the reference's standard setup)
    train_cfg = TrainConfig(augment=False)
    tx = opt_lib.make_train_optimizer(params, lr=2e-4, total_steps=100)
    opt_state = tx.init(params)
    step = ts.make_train_step(cfg, train_cfg, tx, donate=False)
    train_batch = make_batch(TRAIN_B, True)
    key = jax.random.key(1)

    def tstep(p, s):
        return step(p, s, train_batch, key)

    dt_step = timed(tstep, params, opt_state)

    result = {
        "preset": name,
        "eval_fwd_ms": round(dt_fwd * 1e3, 2),
        "eval_utt_per_sec": round(EVAL_B / dt_fwd, 1),
        "train_step_ms": round(dt_step * 1e3, 2),
        "first_wallclock_s": round(compile_s, 1),
        "eval_batch": EVAL_B, "train_batch": TRAIN_B,
        "clip_seconds": SECONDS,
        "gflops_per_utt": round(bm.model_gflops_per_utt(
            cfg, audio_seconds=SECONDS,
            text_tokens=TEXT_TOKENS)["total_gflops"], 1),
    }

    if int8:
        from multilingual_multimodal_speech_emotion_recognition_tpu.ops import quant
        qparams = quant.quantize_backbones(params)
        dt_q = timed(fwd, qparams, eval_batch)
        result["int8_eval_fwd_ms"] = round(dt_q * 1e3, 2)
        result["int8_speedup"] = round(dt_fwd / dt_q, 3)

    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--presets", nargs="*", default=list(PRESETS))
    ap.add_argument("--int8_preset", default="wavlm-large",
                    help="also run the int8-quantized forward on this preset")
    args = ap.parse_args()
    for name in args.presets:
        res = bench_preset(name, int8=(name == args.int8_preset))
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    import jax  # noqa: E402  (after argparse so --help is fast)
    main()

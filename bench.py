#!/usr/bin/env python3
"""Headline benchmark: eval-forward throughput on the flagship model.

Measures utterances/sec/chip for the full inference pipeline — frozen
Wav2Vec2-base audio encoder (+adapter +front-end feature fusion), frozen
XLM-R-base text encoder (+adapter), bidirectional cross-modal attention,
attentive-stats pooling ×2, gated fusion, 35-layer residual OpenMax head —
in bf16 under one jit, on 4-second utterances (the CREMA-D median length).

Baseline: the reference claims ~50 ms/sample inference on a V100-class GPU
(/root/reference/ARCHITECTURE_DOCUMENTATION.md:410) = 20 utterances/sec.
`vs_baseline` is measured-throughput / 20.

Prints ONE JSON line:
  {"metric": "utterances_per_sec_per_chip", "value": N, "unit": "utt/s",
   "vs_baseline": N}
"""

import json
import time

import numpy as np

BATCH = 64   # measured on v5e: throughput saturates ~B=64 (~1000 utt/s)
SECONDS = 4.0
TEXT_TOKENS = 32
WARMUP = 3
ITERS = 10
BASELINE_UTT_PER_SEC = 20.0  # 50 ms/sample on V100 (reference claim)


def main():
    import jax
    import jax.numpy as jnp

    from multilingual_multimodal_speech_emotion_recognition_tpu.config import ModelConfig
    from multilingual_multimodal_speech_emotion_recognition_tpu.models import model as mdl

    cfg = ModelConfig(compute_dtype="bfloat16")
    params = mdl.init_model(jax.random.key(0), cfg)

    rng = np.random.default_rng(0)
    T = int(SECONDS * 16000)
    lengths = rng.integers(int(0.6 * T), T, BATCH)
    audio_mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)
    batch = {
        "audio": jnp.asarray(
            rng.standard_normal((BATCH, T)).astype(np.float32) * 0.1),
        "audio_mask": jnp.asarray(audio_mask),
        "text_ids": jnp.asarray(
            rng.integers(2, cfg.text.vocab_size, (BATCH, TEXT_TOKENS))
            .astype(np.int32)),
        "text_mask": jnp.ones((BATCH, TEXT_TOKENS), jnp.float32),
        "quality_feats": jnp.zeros((BATCH, 8), jnp.float32),
        "cond_feats": jnp.zeros((BATCH, 12), jnp.float32),
    }

    @jax.jit
    def fwd(params, batch):
        out = mdl.model_forward(params, cfg, batch, deterministic=True)
        return out.logits

    # sync via host transfer: on relayed backends (axon tunnel)
    # block_until_ready returns before remote execution completes.
    for _ in range(WARMUP):
        np.asarray(fwd(params, batch))

    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = fwd(params, batch)
    np.asarray(out)
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    utt_per_sec = BATCH * ITERS / dt / n_chips
    print(json.dumps({
        "metric": "utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 2),
        "unit": "utt/s",
        "vs_baseline": round(utt_per_sec / BASELINE_UTT_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

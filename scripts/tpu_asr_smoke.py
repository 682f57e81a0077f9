#!/usr/bin/env python3
"""On-TPU Whisper decode smoke + throughput (VERDICT r3 item 7).

Builds a from-config random-weight Whisper (zero egress — no pretrained
weights reachable; validates lowering + speed, which are
weight-independent), converts it to the TPU-native implementation
(models/whisper.py), and runs the jitted mel -> encoder -> KV-cached
greedy decode on the v5e at whisper-tiny and whisper-base geometry.
Reports compile time, steady-state latency, and tokens/s; also drives
one clip through frontend/asr.py's EnhancedASRIntegration with the
JaxWhisperASR backend (the serving path).

TPU session only:  python scripts/tpu_asr_smoke.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GEOMETRIES = {
    # (d_model, layers, heads, ffn) — whisper-tiny / whisper-base
    "tiny": (384, 4, 6, 1536),
    "base": (512, 6, 8, 2048),
}
MAX_NEW = 48


def main():
    import jax
    import jax.numpy as jnp
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    from multilingual_multimodal_speech_emotion_recognition_tpu.frontend.asr import (
        EnhancedASRIntegration, JaxWhisperASR)

    rng = np.random.default_rng(0)

    for name, (d, L, H, ffn) in GEOMETRIES.items():
        torch.manual_seed(3)
        hf = WhisperForConditionalGeneration(HFConfig(
            vocab_size=51865, num_mel_bins=80, d_model=d,
            encoder_layers=L, encoder_attention_heads=H,
            decoder_layers=L, decoder_attention_heads=H,
            encoder_ffn_dim=ffn, decoder_ffn_dim=ffn,
            max_source_positions=1500, max_target_positions=448,
            decoder_start_token_id=50258, eos_token_id=50257,
            pad_token_id=50257)).eval()
        backend = JaxWhisperASR.from_hf_model(hf, max_new_tokens=MAX_NEW)

        for B in (1, 8, 32):
            wave = jnp.asarray(
                rng.standard_normal((B, 30 * 16000)).astype(np.float32)
                * 0.1)
            prefix = jnp.full((B, 1), 50258, jnp.int32)
            t0 = time.perf_counter()
            toks, confs = backend._decode(backend.params, wave, prefix)
            np.asarray(confs)
            compile_s = time.perf_counter() - t0
            iters = 3
            t0 = time.perf_counter()
            for _ in range(iters):
                toks, confs = backend._decode(backend.params, wave, prefix)
            np.asarray(confs)
            dt = (time.perf_counter() - t0) / iters
            print(json.dumps({
                "model": name, "B": B, "max_new_tokens": MAX_NEW,
                "compile_s": round(compile_s, 1),
                "decode_ms": round(dt * 1e3, 1),
                "tokens_per_s": round(B * MAX_NEW / dt, 1),
                "clips_per_s": round(B / dt, 2)}), flush=True)

        # serving-path smoke: the full ASR feature pipeline on device decode
        integ = EnhancedASRIntegration(backend=backend)
        res = integ.process(np.asarray(
            0.1 * rng.standard_normal(4 * 16000), np.float32))
        print(json.dumps({"model": name, "asr_features_finite":
                          bool(np.isfinite(res.asr_features).all()),
                          "n_tokens": len(res.word_confidences)}),
              flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""On-TPU Whisper decode smoke + throughput (VERDICT r3 item 7; r4 item 5
adds large-v3 geometry).

Builds a from-config random-weight Whisper (zero egress — no pretrained
weights reachable; validates lowering + speed, which are
weight-independent), converts it to the TPU-native implementation
(models/whisper.py), and runs the jitted mel -> encoder -> KV-cached
greedy decode on the v5e at whisper-tiny, whisper-base and whisper-
large-v3 geometry (the reference's fallback literally loads large-v3 —
asr_integration.py:74-81). tiny/base go through the HF-convert path
(params_from_hf); large-v3 (~1.5 B params) is init_whisper'd in bf16
directly ON the device — jax.random generates the weights device-side,
so nothing rides the slow host->device tunnel. Reports compile time,
steady-state latency, tokens/s, and HBM in use / peak
(device.memory_stats) so the KV-cache batch ceiling is on record; also
drives one clip through frontend/asr.py's EnhancedASRIntegration with
the JaxWhisperASR backend (the serving path).

TPU session only:  python scripts/tpu_asr_smoke.py [--only large-v3]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GEOMETRIES = {
    # (d_model, layers, heads, ffn, n_mels, batches)
    "tiny": (384, 4, 6, 1536, 80, (1, 8, 32)),
    "base": (512, 6, 8, 2048, 80, (1, 8, 32)),
    # d=1280, 32 enc/dec layers, 20 heads, 128 mel — openai/whisper-large-v3
    "large-v3": (1280, 32, 20, 5120, 128, (1, 8)),
}
MAX_NEW = 48


def hbm_stats():
    import jax
    s = jax.devices()[0].memory_stats() or {}
    gib = 1024 ** 3
    return {"hbm_in_use_gib": round(s.get("bytes_in_use", 0) / gib, 2),
            "hbm_peak_gib": round(s.get("peak_bytes_in_use", 0) / gib, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="run a single geometry (e.g. large-v3)")
    ap.add_argument("--int8", action="store_true",
                    help="int8 the encoder/decoder matmul stacks "
                         "(ops/quant.py:quantize_whisper) — the decode is "
                         "weight-HBM-bound, so halved weight bytes is the "
                         "serving lever")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    from multilingual_multimodal_speech_emotion_recognition_tpu.frontend.asr import (
        EnhancedASRIntegration, JaxWhisperASR)
    from multilingual_multimodal_speech_emotion_recognition_tpu.models import (
        whisper as jw)

    rng = np.random.default_rng(0)

    for name, (d, L, H, ffn, n_mels, batches) in GEOMETRIES.items():
        if args.only and name != args.only:
            continue
        if name == "large-v3":
            # ~1.5 B params: skip the torch detour, init on-device in bf16
            # (the serving dtype; f32 params alone would be 6.2 GiB HBM)
            cfg = jw.WhisperConfig(
                vocab_size=51866, num_mel_bins=n_mels, d_model=d,
                encoder_layers=L, encoder_attention_heads=H,
                decoder_layers=L, decoder_attention_heads=H,
                encoder_ffn_dim=ffn, decoder_ffn_dim=ffn,
                max_source_positions=1500, max_target_positions=448,
                decoder_start_token_id=50258, eos_token_id=50257)
            t0 = time.perf_counter()
            init = jax.jit(lambda k: jw.init_whisper(
                k, cfg, dtype=jnp.bfloat16))
            params = jax.block_until_ready(init(jax.random.key(0)))
            n_params = sum(int(np.prod(x.shape))
                           for x in jax.tree_util.tree_leaves(params))
            print(json.dumps({"model": name, "init_s":
                              round(time.perf_counter() - t0, 1),
                              "n_params_m": round(n_params / 1e6, 1),
                              **hbm_stats()}), flush=True)
            backend = JaxWhisperASR(params, cfg, max_new_tokens=MAX_NEW,
                                    int8=args.int8)
        else:
            torch.manual_seed(3)
            hf = WhisperForConditionalGeneration(HFConfig(
                vocab_size=51865, num_mel_bins=n_mels, d_model=d,
                encoder_layers=L, encoder_attention_heads=H,
                decoder_layers=L, decoder_attention_heads=H,
                encoder_ffn_dim=ffn, decoder_ffn_dim=ffn,
                max_source_positions=1500, max_target_positions=448,
                decoder_start_token_id=50258, eos_token_id=50257,
                pad_token_id=50257)).eval()
            backend = JaxWhisperASR.from_hf_model(hf, max_new_tokens=MAX_NEW,
                                                  int8=args.int8)

        for B in batches:
            wave = jnp.asarray(
                rng.standard_normal((B, 30 * 16000)).astype(np.float32)
                * 0.1)
            prefix = jnp.full((B, 1), 50258, jnp.int32)
            try:
                t0 = time.perf_counter()
                toks, confs = backend._decode(backend.params, wave, prefix)
                np.asarray(confs)
                compile_s = time.perf_counter() - t0
                iters = 3
                t0 = time.perf_counter()
                for _ in range(iters):
                    toks, confs = backend._decode(backend.params, wave,
                                                  prefix)
                np.asarray(confs)
                dt = (time.perf_counter() - t0) / iters
            except Exception as e:  # RESOURCE_EXHAUSTED: record the ceiling
                print(json.dumps({"model": name, "B": B,
                                  "oom": type(e).__name__,
                                  "detail": str(e)[:200],
                                  **hbm_stats()}), flush=True)
                continue
            print(json.dumps({
                "model": name, "B": B, "max_new_tokens": MAX_NEW,
                "int8": args.int8,
                "compile_s": round(compile_s, 1),
                "decode_ms": round(dt * 1e3, 1),
                "tokens_per_s": round(B * MAX_NEW / dt, 1),
                "clips_per_s": round(B / dt, 2),
                **hbm_stats()}), flush=True)

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

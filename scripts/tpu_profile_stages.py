#!/usr/bin/env python3
"""Per-stage TPU timing of the flagship e2e inference path @ B=64/4 s.

Times each pipeline stage as its own jitted program (sync via np.asarray
of a small reduction — block_until_ready returns early on relayed
backends): front-end DSP (clean + worst-case branch-firing audio), conv
feature extractor, w2v2 transformer stack, XLM-R, and the cross-modal
heads. Stage sums won't exactly equal the fused e2e number (XLA fuses
across stage boundaries in the real program; per-stage programs pay their
own launch/transfer overhead) — use this to RANK hotspots, not as an
exact decomposition. Paste the JSON into CLAUDE.md/PARITY.md when it
changes a decision.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 64
SECONDS = 4.0
TEXT_TOKENS = 32
WARMUP = 3
ITERS = 10


def timed(name, fn, *args):
    for _ in range(WARMUP):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"# {name}: {ms:.2f} ms", flush=True)  # incremental progress
    return ms


def main():
    from multilingual_multimodal_speech_emotion_recognition_tpu.utils import (
        runtime)
    runtime.configure()  # persistent XLA cache: reruns skip the compiles

    import jax
    import jax.numpy as jnp

    from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
        ModelConfig)
    from multilingual_multimodal_speech_emotion_recognition_tpu.eval import (
        benchmark as bm)
    from multilingual_multimodal_speech_emotion_recognition_tpu.models import (
        model as mdl, wav2vec2 as w2v, xlmr as xm)

    cfg = ModelConfig(compute_dtype="bfloat16")
    params = mdl.init_model(jax.random.key(0), cfg)
    p_bf16 = mdl.cast_floating(params, jnp.bfloat16)

    rng = np.random.default_rng(0)
    T = int(SECONDS * 16000)
    lengths = rng.integers(int(0.6 * T), T, BATCH)
    audio_mask = jnp.asarray(
        (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32))
    clean = jnp.asarray(rng.standard_normal((BATCH, T)).astype(np.float32) * 0.1)
    worst = jnp.asarray(bm.worst_case_dsp_audio(rng, BATCH, T)
                        * np.asarray(audio_mask))
    ids = jnp.asarray(rng.integers(2, cfg.text.vocab_size,
                                   (BATCH, TEXT_TOKENS)).astype(np.int32))
    tmask = jnp.ones((BATCH, TEXT_TOKENS), jnp.float32)

    res = {}

    # audio_mask is an ARGUMENT everywhere below (like the params): a
    # [B, T] f32 mask baked as a closure constant is ~16 MB of payload in
    # each remote_compile request and in every cached program
    @jax.jit
    def dsp(wave, wmask):
        w, q, c = mdl.frontend_features(
            cfg, {"audio": wave, "audio_mask": wmask})
        return w.sum() + q.sum() + c.sum()

    res["dsp_clean_ms"] = timed("dsp_clean", dsp, clean, audio_mask)
    res["dsp_worst_ms"] = timed("dsp_worst", dsp, worst, audio_mask)

    wave16 = clean.astype(jnp.bfloat16)

    # params are ARGUMENTS, not closure constants: baked-in weights blow
    # the relay's remote_compile request-size limit (observed HTTP 413 on
    # the XLM-R stage) and bloat every cached program
    @jax.jit
    def conv(bb, wave, wmask):
        h, m = w2v.feature_encoder(bb, cfg.audio, wave, wmask)
        return h.sum()

    res["conv_extractor_ms"] = timed("conv_extractor", conv,
                                     p_bf16["audio_backbone"], wave16,
                                     audio_mask)

    @jax.jit
    def full_w2v2(bb, wave, wmask):
        h, m = w2v.wav2vec2_encode(bb, cfg.audio, wave, wmask)
        return h.sum()

    res["w2v2_full_ms"] = timed("w2v2_full", full_w2v2,
                                p_bf16["audio_backbone"], wave16, audio_mask)
    res["w2v2_transformer_ms"] = round(
        res["w2v2_full_ms"] - res["conv_extractor_ms"], 2)

    @jax.jit
    def text(bb, i, m):
        return xm.xlmr_encode(bb, cfg.text, i, m).sum()

    res["xlmr_ms"] = timed("xlmr", text, p_bf16["text_backbone"], ids, tmask)

    # heads from precomputed sequences — build them under jit (eager
    # op-by-op dispatch on a relayed backend compiles hundreds of one-op
    # programs and takes effectively forever)
    @jax.jit
    def encode_both(pp, wave, wmask, i, m):
        a, am = mdl.encode_audio(pp, cfg, wave, wmask,
                                 quality_feats=jnp.zeros((BATCH, 8)),
                                 cond_feats=jnp.zeros((BATCH, 12)))
        t, tm = mdl.encode_text(pp, cfg, i, m)
        return a, am, t, tm

    a_seq, a_mask, t_seq, t_mask = encode_both(p_bf16, wave16, audio_mask,
                                               ids, tmask)
    np.asarray(a_seq.sum())

    @jax.jit
    def heads(pp, a, am, t, tm):
        out = mdl.model_heads(pp, cfg, a, am, t, tm, deterministic=True)
        return out.logits.sum()

    res["heads_ms"] = timed("heads", heads, params, a_seq, a_mask,
                            t_seq, t_mask)

    res = {k: round(v, 2) for k, v in res.items()}
    res.update(batch=BATCH, clip_seconds=SECONDS)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Sub-stage TPU timing of the device DSP front-end @ B=64/4 s.

The per-stage profile (`tpu_profile_stages.py`) puts the whole front-end
at ~20 ms clean / ~29 ms worst-case — the second-largest e2e stage after
the w2v2 transformer. This script splits it further: quality gates vs the
conditioning chain, and the conditioning chain's own pieces (Welch PSD,
SNR estimate, T60 estimate, LUFS normalization, the spectral-gate
denoiser when it fires). Use it to decide whether any single DSP stage is
still worth optimizing; stage sums exceed the fused number (XLA fuses
across these boundaries in the real program).

All arrays are ARGUMENTS (never closure constants): baked-in [B,T] masks
are ~16 MB per remote_compile payload on the relayed backend.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 128
SECONDS = 4.0
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
    print(f"# {name}: {ms:.2f} ms", flush=True)
    return round(ms, 2)


def main():
    from multilingual_multimodal_speech_emotion_recognition_tpu.utils import (
        runtime)
    runtime.configure()

    import jax
    import jax.numpy as jnp

    from multilingual_multimodal_speech_emotion_recognition_tpu.eval import (
        benchmark as bm)
    from multilingual_multimodal_speech_emotion_recognition_tpu.frontend import (
        conditioning as cond, spectral as sp)
    from multilingual_multimodal_speech_emotion_recognition_tpu.frontend import (
        run_quality_gates)

    rng = np.random.default_rng(0)
    T = int(SECONDS * 16000)
    lengths = rng.integers(int(0.6 * T), T, BATCH)
    # mask stays in numpy until the end: multiplying on host avoids a
    # ~16 MB device->host fetch over the ~3 MB/s relay link
    mask_np = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)
    mask = jnp.asarray(mask_np)
    clean = jnp.asarray(
        rng.standard_normal((BATCH, T)).astype(np.float32) * 0.1)
    worst = jnp.asarray(bm.worst_case_dsp_audio(rng, BATCH, T) * mask_np)
    ent = jnp.full((BATCH,), 1.0, jnp.float32)
    conf = jnp.zeros((BATCH,), jnp.float32)

    res = {}

    @jax.jit
    def gates(w, m, e, c):
        out, q = run_quality_gates(w, m, lid_entropy=e, lid_confidence=c)
        return out.sum() + q.features.sum()

    res["gates_clean_ms"] = timed("gates_clean", gates, clean, mask, ent,
                                  conf)
    res["gates_worst_ms"] = timed("gates_worst", gates, worst, mask, ent,
                                  conf)

    @jax.jit
    def chain(w, m):
        out, c = cond.condition_audio(w, m)
        return out.sum() + c.features.sum()

    res["conditioning_clean_ms"] = timed("conditioning_clean", chain, clean,
                                         mask)
    res["conditioning_worst_ms"] = timed("conditioning_worst", chain, worst,
                                         mask)

    @jax.jit
    def welch(w, m):
        _, psd = sp.welch_psd(w, m, sample_rate=16000, nperseg=2048)
        return psd.sum()

    res["welch_psd_ms"] = timed("welch_psd", welch, clean, mask)

    @jax.jit
    def snr(w, m):
        return cond.estimate_snr_energy(w, m).sum()

    res["snr_energy_ms"] = timed("snr_energy", snr, clean, mask)

    @jax.jit
    def t60(w, m):
        return cond.estimate_t60(w, m, sample_rate=16000).sum()

    res["t60_ms"] = timed("t60", t60, clean, mask)

    @jax.jit
    def lufs(w, m):
        out = cond.normalize_loudness(w, m)
        return out[0].sum()

    res["lufs_ms"] = timed("lufs", lufs, clean, mask)

    @jax.jit
    def denoise(w, m):
        return cond.spectral_gate_denoise(w, m).sum()

    res["denoise_unconditional_ms"] = timed("denoise_unconditional", denoise,
                                            clean, mask)

    res.update(batch=BATCH, clip_seconds=SECONDS)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Real-TPU serving-path benchmark: f32 vs int16 wire, flagship shape.

Measures the artifact-backed serving step (ServingModel.predict) the way
the daemon drives it — host numpy batch in, logits out — for both wire
modes at the headline shape (B=64, 4 s clips, device DSP + OpenMax on):

  host_to_device_bytes  per-batch wire payload (audio+mask vs pcm+lens)
  predict_ms            steady-state wall per predict() incl. transfer
  device_step_ms        program execution alone (pre-staged device batch)

On this box the host<->device link is an axon tunnel (~3-11 MB/s), so
predict_ms is transfer-dominated and the wire ratio shows up near-fully;
on a real v5e host (PCIe) the same byte ratio buys headroom at high QPS
rather than wall-clock per batch. Paste the JSON into PARITY.md.
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 64
SECONDS = 4.0
TEXT_TOKENS = 32
WARMUP = 2
ITERS = 8


def _bytes_of(batch):
    return sum(np.asarray(v).nbytes for v in batch.values())


def main():
    import jax

    from multilingual_multimodal_speech_emotion_recognition_tpu import (
        export as ex)
    from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
        ModelConfig)
    from multilingual_multimodal_speech_emotion_recognition_tpu.models import (
        model as mdl)

    cfg = ModelConfig(compute_dtype="bfloat16")
    params = mdl.init_model(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    T = int(SECONDS * 16000)

    pcm = rng.integers(-3000, 3000, (BATCH, T)).astype(np.int16)
    lens = rng.integers(int(0.6 * T), T + 1, BATCH).astype(np.int32)
    row_mask = (np.arange(T)[None, :] < lens[:, None])
    pcm *= row_mask
    common = {
        "text_ids": rng.integers(2, cfg.text.vocab_size,
                                 (BATCH, TEXT_TOKENS)).astype(np.int32),
        "text_mask": np.ones((BATCH, TEXT_TOKENS), np.float32),
        "lid_entropy": np.full((BATCH,), 1.0, np.float32),
        "lid_conf": np.zeros((BATCH,), np.float32),
    }
    batches = {
        "f32": dict(common,
                    audio=pcm.astype(np.float32) / 32768.0,
                    audio_mask=row_mask.astype(np.float32)),
        "int16": dict(common, audio=pcm, audio_len=lens),
    }

    out_dir = Path(tempfile.mkdtemp(prefix="ser_bench_serving_"))
    report = {"batch": BATCH, "clip_seconds": SECONDS}
    logits = {}
    for wire in ("f32", "int16"):
        t0 = time.perf_counter()
        art = ex.export_forward(params, cfg, out_dir / wire,
                                batch_size=BATCH, audio_seconds=SECONDS,
                                text_tokens=TEXT_TOKENS, with_dsp=True,
                                use_openmax=True, wire=wire)
        export_s = time.perf_counter() - t0
        served = ex.ServingModel(art)
        batch = batches[wire]

        for _ in range(WARMUP):
            out = served.predict(batch)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = served.predict(batch)
        predict_ms = (time.perf_counter() - t0) / ITERS * 1e3
        logits[wire] = out["logits"]

        # device-only step: pre-staged batch, tiny output fetched per iter
        import jax.numpy as jnp
        spec = served.spec["batch_spec"]
        dev_batch = {k: jnp.asarray(np.asarray(batch[k], dtype=d))
                     for k, (s, d) in spec.items()}
        pd = served._params_in_order()
        for _ in range(WARMUP):
            np.asarray(served._call(pd, dev_batch)[0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            o = served._call(pd, dev_batch)
        np.asarray(o[0])
        device_ms = (time.perf_counter() - t0) / ITERS * 1e3

        report[wire] = {
            "host_to_device_bytes": _bytes_of(batch),
            "predict_ms": round(predict_ms, 1),
            "utt_per_sec_incl_transfer": round(BATCH / predict_ms * 1e3, 1),
            "device_step_ms": round(device_ms, 1),
            "export_s": round(export_s, 1),
        }

    dev = float(np.max(np.abs(logits["f32"] - logits["int16"])))
    report["wire_bytes_ratio"] = round(
        report["f32"]["host_to_device_bytes"]
        / report["int16"]["host_to_device_bytes"], 2)
    report["max_logit_dev_f32_vs_int16"] = dev
    report["platform"] = jax.devices()[0].platform
    print(json.dumps(report))


if __name__ == "__main__":
    main()

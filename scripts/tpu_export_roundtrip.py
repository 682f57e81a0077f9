#!/usr/bin/env python3
"""Real-TPU export -> deserialize -> predict parity run (verdict r2 item 7).

Exports the flagship forward (device DSP included, OpenMax on) as a
StableHLO artifact on the TPU platform, reloads it through ServingModel,
and checks the served logits against a live model_forward on the same
batch. Records timings + max deviation; paste the JSON into PARITY.md's
serving section.
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 32
SECONDS = 4.0
TEXT_TOKENS = 32


def main():
    import jax
    import jax.numpy as jnp

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

    out_dir = Path(tempfile.mkdtemp(prefix="ser_export_tpu_"))
    t0 = time.perf_counter()
    art = ex.export_forward(params, cfg, out_dir / "art", batch_size=BATCH,
                            audio_seconds=SECONDS, text_tokens=TEXT_TOKENS,
                            with_dsp=True, use_openmax=True)
    export_s = time.perf_counter() - t0

    batch = {
        "audio": rng.standard_normal((BATCH, T)).astype(np.float32) * 0.1,
        "audio_mask": np.ones((BATCH, T), np.float32),
        "text_ids": rng.integers(2, cfg.text.vocab_size,
                                 (BATCH, TEXT_TOKENS)).astype(np.int32),
        "text_mask": np.ones((BATCH, TEXT_TOKENS), np.float32),
        "lid_entropy": np.full((BATCH,), 1.0, np.float32),
        "lid_conf": np.zeros((BATCH,), np.float32),
    }

    t0 = time.perf_counter()
    served = ex.ServingModel(art)
    load_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    got = served.predict(batch)
    first_predict_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    got2 = served.predict(batch)
    second_predict_s = time.perf_counter() - t0

    want = mdl.model_forward(
        params, cfg, {k: jnp.asarray(v) for k, v in batch.items()},
        deterministic=True, use_openmax=True)
    want_logits = np.asarray(want.logits, np.float32)
    dev = float(np.max(np.abs(got["logits"] - want_logits)))
    dev2 = float(np.max(np.abs(got["logits"] - got2["logits"])))

    program_mb = (art / "program.bin").stat().st_size / 1e6
    params_mb = (art / "params.npz").stat().st_size / 1e6
    print(json.dumps({
        "platforms": served.spec["platforms"],
        "export_s": round(export_s, 1),
        "load_s": round(load_s, 1),
        "first_predict_s": round(first_predict_s, 2),
        "second_predict_s": round(second_predict_s, 3),
        "utt_per_sec_steady": round(BATCH / second_predict_s, 1),
        "max_abs_logit_dev_vs_live": dev,
        "determinism_dev": dev2,
        "program_mb": round(program_mb, 2),
        "params_mb": round(params_mb, 1),
        "batch": BATCH, "clip_seconds": SECONDS, "with_dsp": True,
        "use_openmax": True,
    }), flush=True)
    assert dev < 1e-2, f"served logits deviate from live forward: {dev}"


if __name__ == "__main__":
    main()

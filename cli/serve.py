#!/usr/bin/env python3
"""Long-lived HTTP inference server over an AOT export artifact.

No reference equivalent — its deployment story is a one-shot argparse CLI
that rebuilds the model per run (/root/reference/src/interface.py:423-470).
Pipeline: `cli/export.py --buckets '4:32,8:16' ...` then

    python cli/serve.py --artifact /path/to/export --port 8080

    curl -s localhost:8080/healthz
    curl -s -X POST localhost:8080/predict \
        -d '{"audio": [0.0, 0.01, ...], "sample_rate": 16000,
             "text": "I am so happy today"}'
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", required=True,
                   help="single artifact dir (spec.json) or bucketed "
                        "export dir (index.json)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max_wait_ms", type=float, default=15.0,
                   help="micro-batch deadline: a lone request waits at "
                        "most this long for co-batching")
    p.add_argument("--tokenizer", default="xlm-roberta-base")
    p.add_argument("--vocab_size", type=int, default=250002,
                   help="hash-fallback tokenizer vocab; must match the "
                        "artifact's embedding table")
    p.add_argument("--no_preload", action="store_true",
                   help="deserialize bucket programs lazily on first hit "
                        "instead of at startup")
    p.add_argument("--platform", default=None,
                   help="jax platform override (e.g. cpu) — must match "
                        "the platform the artifact was exported on")
    p.add_argument("--cascade_teacher", default=None,
                   help="teacher artifact dir: --artifact becomes the "
                        "(distilled) student tier and low-confidence "
                        "requests escalate to the teacher (CascadeServer)")
    p.add_argument("--confidence_threshold", type=float, default=0.8,
                   help="cascade: escalate when student max-prob is below")
    p.add_argument("--energy_threshold", type=float, default=None,
                   help="cascade: also escalate when the raw-logit energy "
                        "OOD score is above this (fit on cli/eval.py "
                        "--predictions_out output; same raw-energy scale)")
    args = p.parse_args()

    from multilingual_multimodal_speech_emotion_recognition_tpu.utils import runtime
    runtime.configure(platform=args.platform)  # + persistent XLA compile cache

    from multilingual_multimodal_speech_emotion_recognition_tpu import serving
    from multilingual_multimodal_speech_emotion_recognition_tpu.data.tokenizer \
        import get_tokenizer

    serving.serve(args.artifact, host=args.host, port=args.port,
                  max_wait_ms=args.max_wait_ms,
                  preload=not args.no_preload,
                  tokenizer=get_tokenizer(args.tokenizer,
                                          vocab_size=args.vocab_size),
                  cascade_teacher_dir=args.cascade_teacher,
                  confidence_threshold=args.confidence_threshold,
                  energy_threshold=args.energy_threshold)


if __name__ == "__main__":
    main()

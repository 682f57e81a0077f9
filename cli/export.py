#!/usr/bin/env python3
"""Export a checkpoint as an AOT serving artifact (StableHLO + params).

No reference equivalent (its deployment story is re-running the research
scripts); see multilingual_multimodal_speech_emotion_recognition_tpu/export.py.
Artifacts are per-shape and per-platform — run on the platform you serve on
(e.g. once per audio bucket for bucketed serving).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--audio_seconds", type=float, default=4.0)
    p.add_argument("--buckets", default=None,
                   help="multi-bucket export: comma-separated "
                        "audio_seconds:batch_size pairs (e.g. "
                        "'4:32,8:16,30:8') — one artifact per bucket under "
                        "out_dir plus an index.json; overrides "
                        "--batch_size/--audio_seconds")
    p.add_argument("--autotune_buckets", type=int, default=None,
                   help="derive N bucket caps from --manifest's duration "
                        "distribution (exact minimum padded samples, "
                        "data/bucketing.py) and export one artifact per cap "
                        "at --batch_size; alternative to --buckets")
    p.add_argument("--manifest", default=None,
                   help="jsonl manifest probed for --autotune_buckets")
    p.add_argument("--dataset_root", default=None,
                   help="override the checkpoint config's dataset_root when "
                        "probing --manifest durations")
    p.add_argument("--text_tokens", type=int, default=32)
    p.add_argument("--no_dsp", action="store_true",
                   help="expect precomputed quality/cond feats instead of "
                        "running the device DSP front-end in the program")
    p.add_argument("--no_openmax", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="int8-quantize the frozen backbones before export")
    p.add_argument("--wire", choices=["f32", "int16"], default="f32",
                   help="int16: program takes raw int16 PCM + per-row "
                        "lengths (~4x fewer host->device bytes; bit-exact "
                        "for PCM sources, ~3e-5 quantization otherwise)")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    from multilingual_multimodal_speech_emotion_recognition_tpu.utils import runtime
    runtime.configure(platform=args.platform)  # + persistent XLA compile cache

    from multilingual_multimodal_speech_emotion_recognition_tpu import (
        config as cfg_lib, export as ex)
    from multilingual_multimodal_speech_emotion_recognition_tpu.train import (
        checkpoint as ckpt)

    cfg_json = ckpt.load_config_json(args.checkpoint)
    cfg = cfg_lib.from_json(cfg_json) if cfg_json else cfg_lib.Config()
    params, _, meta = ckpt.restore_checkpoint(args.checkpoint)
    if args.int8:
        from multilingual_multimodal_speech_emotion_recognition_tpu.ops import quant
        params = quant.quantize_backbones(params)

    if args.autotune_buckets:
        if args.buckets:
            p.error("--autotune_buckets and --buckets are exclusive")
        if not args.manifest:
            p.error("--autotune_buckets needs --manifest")
        import dataclasses

        from multilingual_multimodal_speech_emotion_recognition_tpu.data import (
            bucketing)
        dcfg = cfg.data
        if args.dataset_root is not None:
            dcfg = dataclasses.replace(dcfg, dataset_root=args.dataset_root)
        caps, report = bucketing.autotune_from_manifest(
            args.manifest, dcfg, args.autotune_buckets)
        print(report, f"caps={caps}")
        args.buckets = ",".join(f"{c}:{args.batch_size}" for c in caps)

    if args.buckets:
        try:
            buckets = [(float(s), int(b)) for s, b in
                       (pair.split(":") for pair in args.buckets.split(","))]
        except ValueError:
            p.error("--buckets must look like '4:32,8:16' "
                    "(audio_seconds:batch_size pairs)")
        art = ex.export_buckets(
            params, cfg.model, args.out_dir, buckets=buckets,
            text_tokens=args.text_tokens, with_dsp=not args.no_dsp,
            use_openmax=not args.no_openmax, wire=args.wire,
            config_json=cfg_json)
        print(f"Exported {args.checkpoint} (epoch {meta.get('epoch')}) -> "
              f"{art} ({len(buckets)} buckets)")
    else:
        art = ex.export_forward(
            params, cfg.model, args.out_dir, batch_size=args.batch_size,
            audio_seconds=args.audio_seconds, text_tokens=args.text_tokens,
            with_dsp=not args.no_dsp, use_openmax=not args.no_openmax,
            wire=args.wire, config_json=cfg_json)
        print(f"Exported {args.checkpoint} (epoch {meta.get('epoch')}) -> "
              f"{art}")

    # ship the fitted temperature (cli/eval.py --save_temperature) with the
    # artifact so the serving daemon serves calibrated probabilities
    cal = Path(args.checkpoint) / "calibration.json"
    if cal.exists():
        import shutil
        shutil.copy(cal, Path(args.out_dir) / "calibration.json")
        print(f"Shipped {cal} with the artifact")


if __name__ == "__main__":
    main()

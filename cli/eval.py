#!/usr/bin/env python3
"""Evaluation CLI.

Flag-compatible with /root/reference/src/eval.py:71-79 (--manifest,
--checkpoint, --batch_size, --use_tta, --num_tta, --calibrate,
--val_manifest). The checkpoint's embedded config restores the exact model
that was trained (the reference instead hardcodes num_labels=6 at
eval.py:100-107, breaking 4-class checkpoints — documented divergence).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--use_tta", action="store_true")
    p.add_argument("--num_tta", type=int, default=5)
    p.add_argument("--calibrate", action="store_true")
    p.add_argument("--val_manifest", type=str, default=None)
    p.add_argument("--dataset_root", type=str, default=None)
    p.add_argument("--use_asr", action="store_true",
                   help="force the ASR feature path on (normally restored "
                        "from the checkpoint's embedded config)")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--int8", action="store_true",
                   help="int8-quantize the frozen backbones for serving "
                        "(ops/quant.py)")
    p.add_argument("--gates_no_text", action="store_true",
                   help="bit-faithful reference plain-eval mode: the gates "
                        "see no text (eval.py:192 calls the audio encoder "
                        "without texts), so LID enters as the no-text "
                        "fallback constants (1.0, 0.0)")
    p.add_argument("--zero_non_accept", action="store_true",
                   help="bit-faithful reference encoder mode: zero audio "
                        "unless the abstain decision is 'accept' "
                        "(audio_encoder.py:74-77) — also zeroes "
                        "'uncertain' clips, which with any non-empty text "
                        "is every clip; default zeroes on 'reject' only")
    p.add_argument("--ref_pad_semantics", action="store_true",
                   help="bit-faithful reference padding: audio padded to "
                        "the batch's max clip length (not the bucket cap) "
                        "and zero-padded feature frames treated as VALID "
                        "in cross-attention/pooling (the base feature "
                        "extractor returns no attention mask, so the "
                        "reference substitutes all-ones — "
                        "audio_encoder.py:140-163); predictions become "
                        "batch-composition-dependent, as there")
    p.add_argument("--predictions_out", type=str, default=None,
                   help="write per-utterance predictions (path, label, "
                        "prediction, probabilities, confidence, energy) as "
                        "JSONL — the batch-scoring surface the reference "
                        "lacks")
    p.add_argument("--save_temperature", action="store_true",
                   help="persist the fitted temperature (--calibrate) as "
                        "calibration.json inside the checkpoint dir; "
                        "cli/export.py ships it with serving artifacts and "
                        "the serving daemon applies it")
    args = p.parse_args()
    # pure flag validation BEFORE the (potentially hours-long) eval run
    if args.save_temperature and not (args.calibrate and args.val_manifest):
        raise SystemExit("--save_temperature requires --calibrate "
                         "AND --val_manifest to fit one (without the "
                         "val manifest no temperature is fitted and "
                         "1.0 would be persisted as if calibrated)")

    from multilingual_multimodal_speech_emotion_recognition_tpu.utils import runtime
    runtime.configure(platform=args.platform)  # + persistent XLA compile cache

    import dataclasses
    from multilingual_multimodal_speech_emotion_recognition_tpu import config as cfg_lib
    from multilingual_multimodal_speech_emotion_recognition_tpu.eval import evaluate
    from multilingual_multimodal_speech_emotion_recognition_tpu.train import checkpoint as ckpt

    cfg_json = ckpt.load_config_json(args.checkpoint)
    cfg = cfg_lib.from_json(cfg_json) if cfg_json else cfg_lib.Config()
    if args.dataset_root:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, dataset_root=args.dataset_root))
    if args.use_asr:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, use_asr=True),
            data=dataclasses.replace(cfg.data, emit_asr_feats=True))
    if args.gates_no_text:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, gates_see_text=False))
    if args.zero_non_accept:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, zero_non_accept=True))
    if args.ref_pad_semantics:
        # single bucket: the reference has no bucketing — its DataLoader
        # batches MANIFEST-CONSECUTIVE rows and pads each batch to its own
        # max, and with pad-frames-valid masking the batch composition
        # changes the predictions, so grouping by duration would diverge
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, pad_frames_valid=True),
            data=dataclasses.replace(
                cfg.data, pad_to_batch_max=True,
                audio_buckets=(cfg.data.max_audio_seconds,)))

    params, _, meta = ckpt.restore_checkpoint(args.checkpoint)
    if args.int8:
        from multilingual_multimodal_speech_emotion_recognition_tpu.ops import quant
        params = quant.quantize_backbones(params)
    print(f"Loaded checkpoint: {args.checkpoint} "
          f"(epoch {meta.get('epoch')}, f1 {meta.get('f1')})")

    results = evaluate.evaluate_manifest(
        params, cfg, args.manifest, batch_size=args.batch_size,
        use_tta=args.use_tta, num_tta=args.num_tta, calibrate=args.calibrate,
        val_manifest=args.val_manifest)

    if args.predictions_out:
        n = evaluate.write_predictions_jsonl(results, args.manifest,
                                             args.predictions_out)
        print(f"Wrote {n} per-utterance predictions to "
              f"{args.predictions_out}")
    if args.save_temperature:
        import json
        cal_path = Path(args.checkpoint) / "calibration.json"
        cal_path.write_text(json.dumps(
            {"temperature": results["temperature"],
             "fitted_on": args.val_manifest}, indent=2))
        print(f"Saved temperature {results['temperature']:.3f} -> {cal_path}")


if __name__ == "__main__":
    main()

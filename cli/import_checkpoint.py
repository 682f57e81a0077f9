#!/usr/bin/env python3
"""Import a reference-framework torch checkpoint into this framework.

The reference's trainers save a flat torch dict of 8 module state_dicts
(+ optimizer/scheduler/epoch/f1 — /root/reference/src/train.py:247-263;
train_crema.py and src/train_crema_final.py use the identical layout).
This CLI converts one into a native checkpoint directory that
`cli/eval.py --checkpoint`, `cli/infer.py`, `cli/export.py`, and
`cli/serve.py` consume directly — the migration path for users carrying
trained reference models.

  python cli/import_checkpoint.py --reference_checkpoint epoch_5_f1_0.4884.pt \
      --out checkpoints/imported

The model config (label count, classifier depth, backbone variant, which
front-end fusion blocks exist) is inferred from the checkpoint's own
shapes and keys. Two fields are NOT shape-derivable and fall back to
family rules: attention head counts (snapped to a divisor of the hidden
size) and the conv extractor strides (the wav2vec2-standard prefix) — use
--audio_heads/--text_heads/--conv_stride to override for nonstandard
models; the assumed values are printed and recorded in import_report.json.
"""

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference_checkpoint", type=str, required=True,
                   help="path to the reference .pt file")
    p.add_argument("--out", type=str, required=True,
                   help="output checkpoint directory (native format)")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="compute dtype stamped into the imported config")
    p.add_argument("--use_asr", action="store_true",
                   help="enable the ASR feature path in the imported config")
    p.add_argument("--audio_heads", type=int, default=None,
                   help="override the inferred audio attention head count "
                        "(not shape-derivable from separate q/k/v weights)")
    p.add_argument("--text_heads", type=int, default=None,
                   help="override the inferred text attention head count")
    p.add_argument("--conv_stride", type=str, default=None,
                   help="override the conv extractor strides, e.g. "
                        "'5,2,2,2,2,2,2' (not shape-derivable)")
    args = p.parse_args()

    # import/convert runs entirely on host numpy + CPU jax — never touch
    # the TPU relay for a file-format conversion
    import jax
    jax.config.update("jax_platforms", "cpu")

    from multilingual_multimodal_speech_emotion_recognition_tpu import (
        config as cfg_lib)
    from multilingual_multimodal_speech_emotion_recognition_tpu.models import (
        model as mdl, ref_convert)
    from multilingual_multimodal_speech_emotion_recognition_tpu.train import (
        checkpoint as ckpt_lib)

    ckpt = ref_convert.load_reference_checkpoint(args.reference_checkpoint)
    missing = [k for k in ("audio_encoder", "text_encoder", "cross", "pool_a",
                           "pool_t", "fusion", "classifier", "prototypes")
               if k not in ckpt]
    if missing:
        raise SystemExit(
            f"not a reference 8-module checkpoint (missing {missing}); "
            "legacy OpenMaxClassifier/Classifier-only checkpoints are not "
            "supported — retrain or use the Advanced trainers' output")

    model_cfg = ref_convert.infer_model_config(ckpt)
    model_cfg = dataclasses.replace(model_cfg,
                                    compute_dtype=args.compute_dtype,
                                    use_asr=args.use_asr)
    audio_kw = {}
    if args.audio_heads is not None:
        audio_kw["num_attention_heads"] = args.audio_heads
    if args.conv_stride is not None:
        audio_kw["conv_stride"] = tuple(
            int(s) for s in args.conv_stride.split(","))
    if audio_kw:
        model_cfg = dataclasses.replace(
            model_cfg, audio=dataclasses.replace(model_cfg.audio, **audio_kw))
    if args.text_heads is not None:
        model_cfg = dataclasses.replace(
            model_cfg, text=dataclasses.replace(
                model_cfg.text, num_attention_heads=args.text_heads))
    if len(model_cfg.audio.conv_stride) != len(model_cfg.audio.conv_dim):
        raise SystemExit(
            f"conv_stride has {len(model_cfg.audio.conv_stride)} entries but "
            f"the checkpoint carries {len(model_cfg.audio.conv_dim)} conv "
            "layers — pass --conv_stride with one stride per layer")
    cfg = cfg_lib.Config(model=model_cfg)

    init = mdl.init_model(jax.random.key(0), model_cfg)
    params, report = ref_convert.params_from_reference_checkpoint(
        ckpt, model_cfg, init)
    report["assumed"] = {
        "audio_heads": model_cfg.audio.num_attention_heads,
        "text_heads": model_cfg.text.num_attention_heads,
        "conv_stride": list(model_cfg.audio.conv_stride),
        "note": "head counts and conv strides are not derivable from the "
                "checkpoint's tensor shapes; these are the family-rule "
                "values (or your overrides) — wrong heads change attention "
                "math, wrong strides change frame geometry",
    }

    out = ckpt_lib.save_checkpoint(
        args.out, params=params, epoch=report["epoch"], f1=report["f1"],
        config_json=cfg_lib.to_json(cfg),
        extra={"imported_from": str(args.reference_checkpoint)})
    (Path(out) / "import_report.json").write_text(json.dumps(report, indent=2))

    print(f"Imported {args.reference_checkpoint} -> {out}")
    print(f"  epoch={report['epoch']} f1={report['f1']:.4f} "
          f"num_labels={model_cfg.num_labels} "
          f"classifier_layers={model_cfg.classifier_layers} "
          f"audio_hidden={model_cfg.audio_hidden}")
    print(f"  imported subtrees: {len(report['imported'])}")
    print(f"  assumed (not shape-derivable, override via flags): "
          f"audio_heads={report['assumed']['audio_heads']} "
          f"text_heads={report['assumed']['text_heads']} "
          f"conv_stride={report['assumed']['conv_stride']}")
    if report["left_at_init"]:
        print(f"  left at fresh init (absent in the reference checkpoint): "
              f"{report['left_at_init']}")
    if report["skipped"]:
        print(f"  skipped reference tensors (dead/unmappable): "
              f"{report['skipped'][:6]}"
              f"{' ...' if len(report['skipped']) > 6 else ''}")


if __name__ == "__main__":
    main()

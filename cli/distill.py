#!/usr/bin/env python3
"""Distill a trained flagship checkpoint into a small student.

The student checkpoint this writes is an ordinary native checkpoint (its
config embedded), so `cli/eval.py`, `cli/export.py`, the serving daemon,
and `--int8` all work on it unchanged. The 'small' preset is 119M params
vs the flagship's 397M (96M of it the shared 250k-vocab embedding table
— per-clip compute shrinks ~10x). The reference has no
small-model/deployment path at all — this surface is TPU-framework-only.

Example:
    python cli/distill.py --teacher_checkpoint ckpts/best \\
        --train_manifest crema_train_70.jsonl \\
        --val_manifest crema_val_20.jsonl \\
        --student_preset small --epochs 10 --batch_size 32 --lr 3e-4 \\
        --save_dir ckpts_student
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--teacher_checkpoint", type=str, required=True)
    p.add_argument("--train_manifest", type=str, required=True)
    p.add_argument("--val_manifest", type=str, required=True)
    p.add_argument("--student_preset", default="small",
                   choices=["small", "tiny"])
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--temperature", type=float, default=4.0)
    p.add_argument("--alpha", type=float, default=0.9,
                   help="soft-target weight (1-alpha goes to hard-label CE)")
    p.add_argument("--feature_match_weight", type=float, default=0.0,
                   help=">0 adds MSE between a learned projection of the "
                        "student's fused features and the teacher's")
    p.add_argument("--save_dir", type=str, default="checkpoints_student")
    p.add_argument("--dataset_root", type=str, default=None)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--prng_impl", default="rbg",
                   choices=["rbg", "threefry2x32", "unsafe_rbg"])
    args = p.parse_args()

    from multilingual_multimodal_speech_emotion_recognition_tpu.utils import runtime
    runtime.configure(platform=args.platform, prng_impl=args.prng_impl)

    import dataclasses
    from multilingual_multimodal_speech_emotion_recognition_tpu import config as cfg_lib
    from multilingual_multimodal_speech_emotion_recognition_tpu.train import (
        checkpoint as ckpt_lib, distill as dst)

    cfg_json = ckpt_lib.load_config_json(args.teacher_checkpoint)
    teacher_cfg = (cfg_lib.from_json(cfg_json) if cfg_json
                   else cfg_lib.Config())
    if args.dataset_root:
        teacher_cfg = dataclasses.replace(
            teacher_cfg, data=dataclasses.replace(
                teacher_cfg.data, dataset_root=args.dataset_root))
    teacher_params, _, meta = ckpt_lib.restore_checkpoint(
        args.teacher_checkpoint)
    print(f"Teacher: {args.teacher_checkpoint} "
          f"(epoch {meta.get('epoch')}, f1 {meta.get('f1')})")

    train_cfg = dataclasses.replace(
        teacher_cfg.train, epochs=args.epochs, batch_size=args.batch_size,
        lr=args.lr, save_dir=args.save_dir)
    dcfg = dst.DistillConfig(temperature=args.temperature, alpha=args.alpha,
                             feature_match_weight=args.feature_match_weight,
                             student_preset=args.student_preset)
    out = dst.distill(teacher_params, teacher_cfg,
                      train_manifest=args.train_manifest,
                      val_manifest=args.val_manifest,
                      dcfg=dcfg, train_cfg=train_cfg)
    print(f"Best student F1: {out['best_f1']:.4f} -> {out['best_path']}")


if __name__ == "__main__":
    main()

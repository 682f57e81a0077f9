#!/usr/bin/env python3
"""Academic evaluation CLI: the 8-part battery over a frozen checkpoint.

Parity with /root/reference/src/evaluate_academic_complete.py:467-547
(baseline, cross-lingual, calibration, ASR tracking, inference benchmark,
risk-coverage, per-class + confusion, text + JSON reports)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--manifest", required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--output_dir", default="evaluation_results")
    p.add_argument("--dataset_root", default=None)
    p.add_argument("--no_benchmark", action="store_true")
    p.add_argument("--no_few_shot", action="store_true")
    p.add_argument("--no_robustness", action="store_true")
    p.add_argument("--few_shot_shots", type=int, nargs="*", default=None,
                   help="K values for few-shot adaptation (default: the "
                        "reference's 10/25/50/100/250/500, clipped to the "
                        "manifest size)")
    p.add_argument("--few_shot_epochs", type=int, default=5)
    p.add_argument("--full_ft_f1", type=float, default=None,
                   help="full-fine-tune F1 for recovery-rate computation")
    p.add_argument("--snr_levels", type=float, nargs="*", default=None,
                   help="robustness SNR sweep (default 20 15 10 5 0 -5)")
    p.add_argument("--zero_shot_langs", nargs="*", default=None,
                   choices=["hi", "bn", "te"],
                   help="zero-shot cross-lingual eval: render manifest "
                        "texts into these native scripts (same audio), "
                        "report per-language slices + transfer ratios")
    p.add_argument("--open_set_unknown_class", type=str, default=None,
                   help="leave-one-class-out open-set protocol: treat this "
                        "class (index or emotion name, e.g. 'disgust') as "
                        "unknown at eval and report OSCR/AUROC/AUPR/FPR@95 "
                        "for MSP, energy, and OpenMax unknown scores")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    from multilingual_multimodal_speech_emotion_recognition_tpu.utils import runtime
    runtime.configure(platform=args.platform)  # + persistent XLA compile cache

    import dataclasses
    from multilingual_multimodal_speech_emotion_recognition_tpu import config as cfg_lib
    from multilingual_multimodal_speech_emotion_recognition_tpu.eval import academic
    from multilingual_multimodal_speech_emotion_recognition_tpu.train import checkpoint as ckpt

    cfg_json = ckpt.load_config_json(args.checkpoint)
    cfg = cfg_lib.from_json(cfg_json) if cfg_json else cfg_lib.Config()
    if args.dataset_root:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data,
                                          dataset_root=args.dataset_root))
    params, _, meta = ckpt.restore_checkpoint(args.checkpoint)
    print(f"Loaded checkpoint: {args.checkpoint} "
          f"(epoch {meta.get('epoch')}, f1 {meta.get('f1')})")
    unknown_class = None
    if args.open_set_unknown_class is not None:
        try:
            unknown_class = int(args.open_set_unknown_class)
        except ValueError:
            names = academic.EMOTIONS_6[:cfg.model.num_labels]
            if args.open_set_unknown_class not in names:
                p.error(f"--open_set_unknown_class must be an index < "
                        f"{cfg.model.num_labels} or one of {names}")
            unknown_class = names.index(args.open_set_unknown_class)
        if not 0 <= unknown_class < cfg.model.num_labels:
            p.error(f"--open_set_unknown_class index out of range "
                    f"(num_labels={cfg.model.num_labels})")
    academic.run_academic_evaluation(
        params, cfg, args.manifest, batch_size=args.batch_size,
        output_dir=args.output_dir, run_benchmark=not args.no_benchmark,
        run_few_shot=not args.no_few_shot,
        run_robustness=not args.no_robustness,
        few_shot_shots=args.few_shot_shots,
        few_shot_epochs=args.few_shot_epochs,
        full_ft_f1=args.full_ft_f1,
        robustness_snr_levels=args.snr_levels,
        zero_shot_languages=tuple(args.zero_shot_langs or ()),
        open_set_unknown_class=unknown_class)


if __name__ == "__main__":
    main()

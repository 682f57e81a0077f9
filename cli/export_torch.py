#!/usr/bin/env python3
"""Export a native checkpoint to the reference framework's torch format.

The inverse of cli/import_checkpoint.py: writes the flat 8-state_dict
torch .pt layout the reference's own eval.py / interface.py /
evaluate_academic_complete.py load (/root/reference/src/train.py:247-263),
so a model trained here can be inspected or served with the reference
tooling. Tensors the reference requires but this framework deliberately
does not carry (the encoders' dead internal pools, the sibling fusion
blocks unused when combined_fusion is active, the XLM-R pooler the
reference never reads) are emitted as zeros — they cannot influence a
reference forward.

  python cli/export_torch.py --checkpoint checkpoints/epoch_4_f1_0.7123 \
      --out reference_format.pt
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, required=True,
                   help="native checkpoint directory")
    p.add_argument("--out", type=str, required=True, help="output .pt path")
    p.add_argument("--pos_conv_style", default="parametrizations",
                   choices=["parametrizations", "weight_norm", "plain"],
                   help="weight-norm serialization of the positional conv "
                        "(torch>=2.1 loads 'parametrizations'; older "
                        "torch expects 'weight_norm')")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import torch

    from multilingual_multimodal_speech_emotion_recognition_tpu import (
        config as cfg_lib)
    from multilingual_multimodal_speech_emotion_recognition_tpu.models import (
        ref_convert)
    from multilingual_multimodal_speech_emotion_recognition_tpu.train import (
        checkpoint as ckpt_lib)

    cfg_json = ckpt_lib.load_config_json(args.checkpoint)
    cfg = cfg_lib.from_json(cfg_json) if cfg_json else cfg_lib.Config()
    params, _, meta = ckpt_lib.restore_checkpoint(args.checkpoint)

    ckpt = ref_convert.reference_state_dicts_from_params(
        params, cfg.model, pos_conv_style=args.pos_conv_style)
    ckpt["optimizer"] = {"state": {}, "param_groups": []}
    ckpt["scheduler"] = {}
    ckpt["epoch"] = int(meta.get("epoch", 0))
    ckpt["f1"] = float(meta.get("f1", 0.0))
    torch.save(ckpt, args.out)
    n = sum(len(sd) for k, sd in ckpt.items() if isinstance(sd, dict))
    print(f"Exported {args.checkpoint} -> {args.out} "
          f"({n} tensors, epoch={ckpt['epoch']}, f1={ckpt['f1']:.4f})")


if __name__ == "__main__":
    main()

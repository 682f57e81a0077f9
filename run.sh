#!/usr/bin/env bash
# Default training entry point (parity with /root/reference/run.sh:1-15,
# minus the HF/Torch/Whisper cache-dir exports the JAX stack doesn't need).
set -euo pipefail
cd "$(dirname "$0")"

export TOKENIZERS_PARALLELISM=false

python cli/train.py \
  --train_manifest "${TRAIN_MANIFEST:-crema_train_70.jsonl}" \
  --val_manifest "${VAL_MANIFEST:-crema_val_20.jsonl}" \
  --epochs "${EPOCHS:-5}" \
  --batch_size "${BATCH_SIZE:-32}" \
  --lr "${LR:-1e-4}" \
  --use_amp --augment \
  --save_dir "${SAVE_DIR:-checkpoints}" \
  "$@"

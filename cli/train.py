#!/usr/bin/env python3
"""Training CLI.

Flag-compatible with /root/reference/src/train.py:27-39 (--train_manifest,
--val_manifest, --epochs, --batch_size, --lr, --warmup_ratio, --use_amp,
--augment, --proto_weight, --save_dir, --resume_from), plus the
train_crema.py knobs as options (--num_labels 6, --scheduler
cosine_restarts, --grad_clip, --early_stop_patience, --seed).

--use_amp maps to bf16 compute (no GradScaler needed on TPU).
"""

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_manifest", type=str, default="train_70.jsonl")
    p.add_argument("--val_manifest", type=str, default="val_20.jsonl")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup_ratio", type=float, default=0.1)
    p.add_argument("--use_amp", action="store_true",
                   help="bf16 compute (TPU-native AMP; no loss scaler)")
    p.add_argument("--augment", action="store_true")
    p.add_argument("--proto_weight", type=float, default=0.05)
    p.add_argument("--save_dir", type=str, default="checkpoints")
    p.add_argument("--resume_from", type=str, default=None)
    # extensions (presets from train_crema*.py)
    p.add_argument("--num_labels", type=int, default=4)
    p.add_argument("--scheduler", choices=["warmup_cosine", "cosine_restarts"],
                   default="warmup_cosine")
    p.add_argument("--grad_clip", type=float, default=None)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatches per optimizer step (batch_size stays "
                        "the effective batch; bounds activation memory)")
    p.add_argument("--backbone_moment_dtype", default=None,
                   choices=[None, "bfloat16", "float32"],
                   help="AdamW first-moment dtype for the audio/text "
                        "backbone groups (bfloat16 halves mu HBM when "
                        "fine-tuning unfrozen; heads stay f32)")
    p.add_argument("--early_stop_patience", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dataset_root", type=str, default="datasets")
    p.add_argument("--supcon_weight", type=float, default=0.0)
    p.add_argument("--no_quality_gates", action="store_true")
    p.add_argument("--no_audio_conditioning", action="store_true")
    p.add_argument("--use_asr", action="store_true",
                   help="fuse 8-dim ASR features into the text encoder and "
                        "emit them from the data pipeline "
                        "(train_crema.py:122, text_encoder.py:39-48)")
    p.add_argument("--audio_backbone",
                   choices=["wav2vec2-base", "wav2vec2-large", "hubert-large",
                            "wavlm-large"],
                   default="wav2vec2-base",
                   help="audio backbone architecture preset (large presets "
                        "use the stable-LN / layer-norm-conv variant; "
                        "wavlm-large adds gated relative position bias)")
    p.add_argument("--wav2vec2_checkpoint", type=str, default=None,
                   help="path or HF name for pretrained audio backbone")
    p.add_argument("--xlmr_checkpoint", type=str, default=None)
    p.add_argument("--platform", type=str, default=None,
                   help="override jax platform (e.g. cpu for testing)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="model (tensor-parallel) mesh axis size")
    p.add_argument("--mesh_dcn", type=int, default=1,
                   help="multi-slice pods: number of slices; pure data "
                        "parallelism over DCN, slice-major 'data' axis")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-style fully-sharded data parallelism: params, "
                        "grads and optimizer state shard over the 'data' "
                        "axis (parallel/mesh.py:param_shardings)")
    p.add_argument("--fsdp_min_size", type=int, default=None,
                   help="leaves with fewer elements than this replicate "
                        "under --fsdp (default mesh.FSDP_MIN_SIZE=32768)")
    p.add_argument("--autotune_buckets", type=int, default=None,
                   help="replace the default audio buckets with N caps that "
                        "exactly minimize padded samples for the train "
                        "manifest's duration distribution (each cap is one "
                        "compiled shape; see data/bucketing.py)")
    p.add_argument("--preset", choices=["default", "crema_m3", "crema_final"],
                   default="default",
                   help="crema_m3 = train_crema.py knobs (6-class, softened "
                        "focal, L2-normalized proto, restarts, grad clip); "
                        "crema_final = src/train_crema_final.py knobs "
                        "(stronger dropout, consistency-augmentation CE)")
    p.add_argument("--two_phase", action="store_true",
                   help="phase 1 frozen encoders, phase 2 full fine-tune "
                        "(working replacement for src/train_two_phase.py)")
    p.add_argument("--prng_impl", default="rbg",
                   choices=["rbg", "threefry2x32", "unsafe_rbg"],
                   help="jax.random backend; rbg (XLA RngBitGenerator) cuts "
                        "the dropout-mask cost of the training forward "
                        "(121 -> 102 ms @ B=128/4 s on v5e). Pass "
                        "threefry2x32 for bit-reproducible random streams")
    p.add_argument("--coordinator_address", default=None,
                   help="multi-host (pod) jobs: host:port of process 0 for "
                        "jax.distributed; with no flags/env hints the "
                        "runtime stays single-process "
                        "(parallel/multihost.py:initialize)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    args = p.parse_args()

    from multilingual_multimodal_speech_emotion_recognition_tpu.utils import runtime
    runtime.configure(platform=args.platform,  # + persistent compile cache
                      prng_impl=args.prng_impl)

    # Multi-host pods: must run before the first computation initializes
    # the backend. No-op unless pod env hints or explicit flags are present.
    from multilingual_multimodal_speech_emotion_recognition_tpu.parallel import (
        multihost)
    if multihost.initialize(coordinator_address=args.coordinator_address,
                            num_processes=args.num_processes,
                            process_id=args.process_id):
        import jax
        print(f"multi-host: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")

    from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
        Config, DataConfig, MeshConfig, ModelConfig, TrainConfig)
    from multilingual_multimodal_speech_emotion_recognition_tpu.train import loop

    train_kw = dict(
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        warmup_ratio=args.warmup_ratio, augment=args.augment,
        proto_weight=args.proto_weight, save_dir=args.save_dir,
        resume_from=args.resume_from, scheduler=args.scheduler,
        grad_clip=args.grad_clip, seed=args.seed,
        grad_accum=args.grad_accum,
        backbone_moment_dtype=args.backbone_moment_dtype,
        supcon_weight=args.supcon_weight,
        early_stop_patience=args.early_stop_patience)
    num_labels = args.num_labels
    dropout = 0.15
    if args.preset == "crema_m3":
        # train_crema.py:95-517 — 6-class, softened focal (beta .99 gamma 1),
        # loss = CE + 0.1*focal + w*proto(L2-normalized), grad clip, restarts
        num_labels = 6
        train_kw.update(focal_weight=0.1, focal_beta=0.99, focal_gamma=1.0,
                        proto_l2_normalize=True,
                        proto_term_weight=args.proto_weight,
                        scheduler="cosine_restarts",
                        grad_clip=args.grad_clip or 1.0)
    elif args.preset == "crema_final":
        # src/train_crema_final.py:65-418 — 4-class, dropout 0.25, restarts
        # T0=3 epochs, 0.3*CE(augmented) on 30% of steps,
        # loss = CE + 0.5*focal + 0.1*proto
        num_labels = 4
        dropout = 0.25
        train_kw.update(focal_weight=0.5, proto_term_weight=0.1,
                        consistency_aug_weight=0.3,
                        consistency_aug_fraction=0.3,
                        scheduler="cosine_restarts", restart_period_epochs=3,
                        grad_clip=args.grad_clip or 1.0)

    data_kw = dict(dataset_root=args.dataset_root,
                   emit_asr_feats=args.use_asr)
    if args.autotune_buckets:
        from multilingual_multimodal_speech_emotion_recognition_tpu.data import (
            bucketing)
        caps, report = bucketing.autotune_from_manifest(
            args.train_manifest, DataConfig(**data_kw), args.autotune_buckets)
        print(report, f"caps={caps}")
        data_kw["audio_buckets"] = caps

    from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
        AUDIO_BACKBONE_PRESETS)
    cfg = Config(
        model=ModelConfig(
            num_labels=num_labels,
            classifier_dropout=dropout,
            compute_dtype="bfloat16" if args.use_amp else "float32",
            use_quality_gates=not args.no_quality_gates,
            use_audio_conditioning=not args.no_audio_conditioning,
            use_asr=args.use_asr,
            audio=AUDIO_BACKBONE_PRESETS[args.audio_backbone]()),
        data=DataConfig(**data_kw),
        train=TrainConfig(**train_kw),
        mesh=MeshConfig(model_axis=args.mesh_model, dcn_data=args.mesh_dcn,
                        fsdp=args.fsdp, fsdp_min_size=args.fsdp_min_size))

    pretrained = {}
    if args.wav2vec2_checkpoint:
        # AutoModel resolves Wav2Vec2Model or HubertModel; both convert
        # through hf_convert.wav2vec2_from_hf (identical key layout)
        from transformers import AutoModel
        pretrained["wav2vec2_state"] = AutoModel.from_pretrained(
            args.wav2vec2_checkpoint).state_dict()
    if args.xlmr_checkpoint:
        from transformers import AutoModel
        pretrained["xlmr_state"] = AutoModel.from_pretrained(
            args.xlmr_checkpoint).state_dict()

    if args.two_phase:
        result = loop.train_two_phase(
            cfg, train_manifest=args.train_manifest,
            val_manifest=args.val_manifest, pretrained=pretrained or None)
    else:
        result = loop.train(cfg, train_manifest=args.train_manifest,
                            val_manifest=args.val_manifest,
                            pretrained=pretrained or None)
    print(f"Best F1: {result['best_f1']:.4f}")


if __name__ == "__main__":
    main()

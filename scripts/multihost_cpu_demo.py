#!/usr/bin/env python3
"""REAL multi-process pod training on one machine (CPU backend + gloo).

The multi-host layer (parallel/multihost.py) is exercised here with an
actual `jax.distributed` runtime — not simulated process indices: the
parent spawns N child processes, each of which owns 2 CPU devices, joins
the same coordinator, and runs the full `train.loop.train` path end to end
on a tiny synthetic dataset:

  * HostShardedLoader — every process the same global plan, decoding only
    its own rows;
  * mesh.shard_batch -> put_sharded -> make_array_from_process_local_data
    assembling GLOBAL batch arrays across processes;
  * the jitted train step over the global ('data','model') mesh, its
    gradient all-reduce riding the (gloo) collective backend;
  * evaluate(): local_rows pairing + allgather_rows so every process
    computes identical metrics and the identical Weibull fit;
  * checkpoint writes gated to the coordinator after the host_replicated
    collective; metrics JSONL written once.

The parent asserts all of that, prints one summary JSON line, and exits
non-zero on any violation. On a real v5e pod the identical code path runs
with platform=tpu and the pod's own coordinator — nothing here is
CPU-specific except the two config lines in `_child`.

Usage:  python scripts/multihost_cpu_demo.py [--processes 2] [--epochs 2]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SR = 16000
FREQS = [250.0, 500.0, 1000.0, 2000.0]
TEXTS = ["angry shouting words", "happy cheerful words",
         "sad crying words", "neutral plain words"]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _make_dataset(root: Path, n: int = 32) -> None:
    import numpy as np
    sys.path.insert(0, str(REPO))
    from multilingual_multimodal_speech_emotion_recognition_tpu.data import (
        audio_io as aio, manifest as man)
    rng = np.random.default_rng(0)
    wavdir = root / "datasets" / "synth"
    wavdir.mkdir(parents=True)
    items = []
    for i in range(n):
        label = i % 4
        L = int(SR * (0.6 + 0.05 * (i % 5)))
        t = np.arange(L) / SR
        x = 0.5 * np.sin(2 * np.pi * FREQS[label] * t)
        x += 0.01 * rng.standard_normal(L)
        aio.write_wav(wavdir / f"s{i:03d}.wav", x.astype(np.float32), SR)
        items.append({"audio": f"synth/s{i:03d}.wav", "text": TEXTS[label],
                      "label": label, "dataset": "synth"})
    man.write_manifest(root / "train.jsonl", items[: n - 8])
    man.write_manifest(root / "val.jsonl", items[n - 8:])


def _child(args) -> None:
    # platform/collectives/distributed MUST be configured before the first
    # computation initializes a backend
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    sys.path.insert(0, str(REPO))
    from multilingual_multimodal_speech_emotion_recognition_tpu.parallel import (
        multihost as mh)
    assert mh.initialize(coordinator_address=f"127.0.0.1:{args.port}",
                         num_processes=args.processes,
                         process_id=args.child), "distributed init failed"
    assert jax.device_count() == 2 * args.processes

    from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig, Wav2Vec2Config,
        XLMRConfig)
    from multilingual_multimodal_speech_emotion_recognition_tpu.data.tokenizer import (
        HashTokenizer)
    from multilingual_multimodal_speech_emotion_recognition_tpu.train import (
        loop)

    root = Path(args.workdir)
    cfg = Config(
        model=ModelConfig(
            num_labels=4, adapter_dim=8, shared_dim=16, num_heads=4,
            proj_dim=32, classifier_layers=3, classifier_base_dim=32,
            frontend_dsp=False,
            audio=Wav2Vec2Config(conv_dim=(8, 8), conv_stride=(10, 8),
                                 conv_kernel=(10, 3), hidden_size=16,
                                 num_hidden_layers=2, num_attention_heads=4,
                                 intermediate_size=32,
                                 num_conv_pos_embeddings=16,
                                 num_conv_pos_embedding_groups=4,
                                 apply_spec_augment=False),
            text=XLMRConfig(vocab_size=100, hidden_size=16,
                            num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=32,
                            max_position_embeddings=40)),
        data=DataConfig(audio_buckets=(1.0,), max_text_tokens=12,
                        dataset_root=str(root / "datasets")),
        train=TrainConfig(epochs=args.epochs, batch_size=4, lr=5e-3,
                          warmup_ratio=0.1, seed=0, proto_weight=0.05,
                          save_dir=str(root / "ckpt")))

    result = loop.train(cfg, train_manifest=str(root / "train.jsonl"),
                        val_manifest=str(root / "val.jsonl"),
                        tokenizer=HashTokenizer(vocab_size=100),
                        progress=False)
    out = {
        "process": args.child,
        "is_coordinator": mh.is_coordinator(),
        "global_devices": jax.device_count(),
        "best_f1": float(result["best_f1"]),
        "final_f1": float(result["final_f1"]),
        "history": [{"epoch": h["epoch"],
                     "train_loss": round(h["train_loss"], 6),
                     "val_f1": round(h["val_f1"], 6)}
                    for h in result["history"]],
        # the Weibull fit is computed from allgather_rows'd features on
        # every process — its checksum must agree across processes
        "weibull_sum": float(__import__("numpy").abs(__import__("numpy").asarray(
            result["params"]["classifier"]["weibull"]["activation_vectors"]
        )).sum()),
    }
    (root / f"result_{args.child}.json").write_text(json.dumps(out))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--processes", type=int, default=2)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--child", type=int, default=None)
    p.add_argument("--port", type=int, default=None)
    p.add_argument("--workdir", default=None)
    p.add_argument("--timeout", type=int, default=420)
    args = p.parse_args()

    if args.child is not None:
        _child(args)
        return 0

    workdir = Path(args.workdir or tempfile.mkdtemp(prefix="mh_demo_"))
    _make_dataset(workdir)
    port = args.port or _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the child flips config itself
    procs = [subprocess.Popen(
        [sys.executable, __file__, "--child", str(i), "--processes",
         str(args.processes), "--epochs", str(args.epochs),
         "--port", str(port), "--workdir", str(workdir)],
        env=env) for i in range(args.processes)]
    rcs = [pr.wait(timeout=args.timeout) for pr in procs]
    assert all(rc == 0 for rc in rcs), f"child exit codes {rcs}"

    results = [json.loads((workdir / f"result_{i}.json").read_text())
               for i in range(args.processes)]
    r0 = results[0]
    assert r0["is_coordinator"] and not any(r["is_coordinator"]
                                            for r in results[1:])
    for r in results[1:]:
        # every process must have computed IDENTICAL metrics and Weibull
        # fits from the allgathered eval set
        assert r["history"] == r0["history"], (r, r0)
        assert r["best_f1"] == r0["best_f1"]
        assert abs(r["weibull_sum"] - r0["weibull_sum"]) < 1e-4
    assert r0["weibull_sum"] > 0, "Weibull never fitted"

    # coordinator-only artifacts: metrics JSONL + checkpoints exist exactly
    # under the shared save_dir, written once (no per-process duplicates)
    ckpt_dir = workdir / "ckpt"
    assert (ckpt_dir / "metrics.jsonl").exists()
    epochs = [d for d in ckpt_dir.iterdir() if d.name.startswith("epoch_")]
    assert len(epochs) == args.epochs, sorted(d.name for d in epochs)

    print(json.dumps({"ok": True, "processes": args.processes,
                      "global_devices": r0["global_devices"],
                      "epochs": args.epochs, "best_f1": r0["best_f1"],
                      "history": r0["history"], "workdir": str(workdir)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

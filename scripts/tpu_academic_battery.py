#!/usr/bin/env python3
"""Run the FULL academic battery end-to-end on the real TPU and record
the artifact (VERDICT r3 item 5).

Pipeline (all through the public CLIs, one TPU job at a time):
  1. synthesize a gate-passing dataset (reuses the differential harness's
     clip design) + train/val manifests;
  2. train the flagship a few epochs on the v5e via cli/train.py;
  3. run cli/academic_eval.py with every part on (8 parts + per-SNR +
     zero-shot hi/bn/te + leave-one-class-out open-set), on the TPU;
  4. copy the JSON report (incl. per-part wall-clock, eval/academic.py
     part_seconds) to docs/ACADEMIC_TPU_r05.json.

usage: python scripts/tpu_academic_battery.py [--workdir /tmp/acad]
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from ref_differential import _synth_clip, _write_wav, TEXTS  # noqa: E402

SR = 16000


def synth(workdir: Path, n_train: int = 96, n_val: int = 48) -> None:
    audio_dir = workdir / "datasets" / "crema"
    audio_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    rows = []
    for i in range(n_train + n_val):
        x = _synth_clip(rng, i)
        # light per-class spectral coloring so the task is learnable
        label = i % 6
        t = np.arange(len(x)) / SR
        x = x + 0.05 * np.sin(2 * np.pi * (900 + 140 * label) * t).astype(
            np.float32) * (np.abs(x) > 1e-3)
        name = f"a{i:03d}.wav"
        _write_wav(audio_dir / name, np.clip(x, -0.95, 0.95))
        rows.append({"audio": f"crema/{name}", "text": TEXTS[label],
                     "label": label, "dataset": "crema"})
    (workdir / "train.jsonl").write_text(
        "".join(json.dumps(r) + "\n" for r in rows[:n_train]))
    (workdir / "val.jsonl").write_text(
        "".join(json.dumps(r) + "\n" for r in rows[n_train:]))
    print(f"synth: {n_train} train / {n_val} val clips")


def run(cmd: list[str], cwd: Path, tag: str) -> None:
    print(f"--- {tag}: {' '.join(cmd[1:3])} ...", flush=True)
    t0 = time.perf_counter()
    r = subprocess.run(cmd, cwd=cwd, capture_output=True, text=True,
                       timeout=7200)
    (cwd / f"{tag}.stdout.txt").write_text(r.stdout)
    (cwd / f"{tag}.stderr.txt").write_text(r.stderr)
    if r.returncode != 0:
        print(r.stdout[-2000:])
        print(r.stderr[-4000:])
        raise SystemExit(f"{tag} failed")
    print(f"--- {tag} done in {time.perf_counter() - t0:.0f}s", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/acad")
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()
    workdir = Path(args.workdir)
    if args.fresh and workdir.exists():
        shutil.rmtree(workdir)
    workdir.mkdir(parents=True, exist_ok=True)

    if not (workdir / "val.jsonl").exists():
        synth(workdir)

    ckpt_dir = workdir / "ckpts"
    if not sorted(ckpt_dir.glob("epoch_*")):
        run([sys.executable, str(REPO / "cli" / "train.py"),
             "--train_manifest", str(workdir / "train.jsonl"),
             "--val_manifest", str(workdir / "val.jsonl"),
             "--dataset_root", str(workdir / "datasets"),
             "--epochs", str(args.epochs), "--batch_size", "16",
             "--num_labels", "6",
             "--save_dir", str(ckpt_dir)], workdir, "train")

    # highest-F1 checkpoint (dir names carry the score: epoch_{e}_f1_{f1})
    cands = sorted(ckpt_dir.glob("epoch_*"),
                   key=lambda p: float(p.name.split("_f1_")[1]))
    if not cands:
        raise SystemExit(f"no checkpoint produced under {ckpt_dir}")
    best = cands[-1]

    out_dir = workdir / "evaluation_results"
    t0 = time.perf_counter()
    run([sys.executable, str(REPO / "cli" / "academic_eval.py"),
         "--checkpoint", str(best),
         "--manifest", str(workdir / "val.jsonl"),
         "--dataset_root", str(workdir / "datasets"),
         "--batch_size", "16",
         "--output_dir", str(out_dir),
         "--zero_shot_langs", "hi", "bn", "te",
         "--open_set_unknown_class", "disgust",
         "--few_shot_shots", "10", "25",
         "--few_shot_epochs", "3"], workdir, "academic")
    wall = time.perf_counter() - t0

    reports = sorted(out_dir.glob("*.json"))
    if not reports:
        raise SystemExit("no JSON report produced")
    rep = json.loads(reports[-1].read_text())
    rep["_battery_wall_seconds"] = round(wall, 1)
    rep["_checkpoint"] = str(best)
    dest = REPO / "docs" / "ACADEMIC_TPU_r05.json"
    dest.write_text(json.dumps(rep, indent=2))
    print(f"report -> {dest}")
    print(json.dumps({"battery_wall_s": rep["_battery_wall_seconds"],
                      "part_seconds": rep.get("part_seconds"),
                      "baseline_f1": rep.get("baseline", {}).get(
                          "weighted_f1")}, indent=1))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Manifest creation / splitting CLI.

Covers the reference's manifest tooling (SURVEY.md §2.5): dataset scanning
with filename-derived labels (CREMA-D / RAVDESS / TESS —
create_comprehensive_manifest.py:14-99, src/create_crema_manifest.py:12-104),
size filtering (create_filtered_manifest.py:14-49), stratified 70/20/10
splits (split_manifests.py:14-57), and speaker-disjoint splits
(dataset_loader.py:162-189)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="datasets root directory")
    p.add_argument("--datasets", nargs="+", default=["crema"],
                   choices=["crema", "ravdess", "tess"])
    p.add_argument("--num_classes", type=int, default=4, choices=[4, 6])
    p.add_argument("--out_prefix", default="manifest")
    p.add_argument("--split", choices=["none", "stratified", "speaker"],
                   default="stratified")
    p.add_argument("--ratios", nargs=3, type=float, default=[0.7, 0.2, 0.1])
    p.add_argument("--min_bytes", type=int, default=None,
                   help="drop files smaller than this (corruption filter)")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from multilingual_multimodal_speech_emotion_recognition_tpu.data import (
        manifest as man)

    items = []
    for ds in args.datasets:
        found = man.scan_dataset(args.root, ds, num_classes=args.num_classes)
        print(f"{ds}: {len(found)} items")
        items.extend(found)
    if args.min_bytes:
        items = man.filter_by_size(items, args.root, min_bytes=args.min_bytes)
        print(f"after size filter: {len(items)}")
    print(f"class distribution: {man.class_distribution(items)}")

    if args.split == "none":
        man.write_manifest(f"{args.out_prefix}.jsonl", items)
        print(f"wrote {args.out_prefix}.jsonl ({len(items)})")
        return

    if args.split == "stratified":
        splits = man.stratified_split(items, ratios=tuple(args.ratios),
                                      seed=args.seed)
    else:
        splits = man.speaker_disjoint_split(items, ratios=tuple(args.ratios),
                                            seed=args.seed)
    for name, subset in zip(("train", "val", "test"), splits):
        path = f"{args.out_prefix}_{name}.jsonl"
        man.write_manifest(path, subset)
        print(f"wrote {path} ({len(subset)})")


if __name__ == "__main__":
    main()

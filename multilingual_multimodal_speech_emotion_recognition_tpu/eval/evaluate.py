"""Evaluation: TTA, temperature calibration, OpenMax, full reporting.

Parity targets (/root/reference/src/eval.py):
  * 5-view TTA (orig, speed .95/1.05, noise 15/20 dB), logits averaged —
    eval.py:23-41, 174-190. The reference re-encodes each view in a Python
    loop; here the batch expands to [V*B] on device and one forward serves
    all views (OpenMax active per view, matching classifier defaults).
  * temperature scaling via a 100-point logspace grid minimizing
    mean|maxprob - correct| on a val manifest — eval.py:44-67.
  * reported metrics: weighted F1, energy-score stats, classification
    report, confusion matrix, per-class accuracy, confidence histogram —
    eval.py:219-252.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import pipeline as pipeline_mod
from ..data.pipeline import BucketedLoader, SERDataset
from ..data.tokenizer import Tokenizer, get_tokenizer
from ..models import model as mdl
from ..ops import audio_dsp, openmax as om
from ..parallel import mesh as mesh_lib
from ..utils import metrics as M

SIX_NAMES = ["angry", "happy", "sad", "neutral", "disgust", "fear"]


def temperature_scaling(logits: np.ndarray, temperature: float) -> np.ndarray:
    return logits / temperature


def find_optimal_temperature(val_logits: np.ndarray, val_labels: np.ndarray) -> float:
    """Grid search (eval.py:49-67)."""
    temps = np.logspace(-1, 2, 100)
    best_t, best_ece = 1.0, np.inf
    for t in temps:
        scaled = val_logits / t
        e = np.exp(scaled - scaled.max(axis=1, keepdims=True))
        probs = e / e.sum(axis=1, keepdims=True)
        maxp = probs.max(axis=1)
        preds = probs.argmax(axis=1)
        ece = np.mean(np.abs(maxp - (preds == val_labels).astype(np.float64)))
        if ece < best_ece:
            best_ece, best_t = ece, float(t)
    return best_t


@functools.lru_cache(maxsize=16)
def make_tta_eval_step(cfg: Config, num_tta: int = 5, use_openmax: bool = True):
    """One jitted forward over the [V*B] expanded batch, logits meaned
    over views.

    The text inputs are identical across the V augmented views (TTA only
    perturbs the waveform — eval.py:23-41), and XLM-R is deterministic at
    eval, so the text encoder runs ONCE at [B] and its encoded sequence is
    tiled to [V*B] for the cross-modal heads. The reference re-encodes the
    text per view inside its per-clip TTA loop (eval.py:179-190); skipping
    the V-1 redundant XLM-R forwards is logit-identical and saves ~4× the
    text-encoder cost in this serving mode."""

    def step(params, batch, rng):
        V = num_tta
        B = batch["audio"].shape[0]
        tile = lambda x: jnp.concatenate([x] * V, axis=0)
        mcfg = cfg.model
        dtype = jnp.bfloat16 if mcfg.compute_dtype == "bfloat16" else jnp.float32
        p = mdl.cast_floating(params, dtype) if dtype != jnp.float32 else params

        wave, mask = audio_dsp.tta_expand(rng, batch["audio"],
                                          batch["audio_mask"], num_tta=V)
        fbatch = {"audio": wave, "audio_mask": mask}
        for k in ("quality_feats", "cond_feats", "lid_entropy", "lid_conf"):
            if k in batch:
                fbatch[k] = tile(batch[k])
        wave, quality_feats, cond_feats = mdl.frontend_features(mcfg, fbatch)

        a_seq, a_mask = mdl.encode_audio(
            p, mcfg, wave.astype(dtype), mask,
            quality_feats=quality_feats, cond_feats=cond_feats,
            deterministic=True)
        t_seq, t_mask = mdl.encode_text(
            p, mcfg, batch["text_ids"], batch["text_mask"],
            asr_feats=batch.get("asr_feats"), deterministic=True)

        out = mdl.model_heads(params, mcfg, a_seq, a_mask,
                              tile(t_seq), tile(t_mask),
                              deterministic=True, use_openmax=use_openmax)
        return out.logits.reshape(V, B, -1).mean(axis=0)

    return jax.jit(step)


def collect_logits(params, cfg: Config, loader: BucketedLoader, mesh, *,
                   use_tta: bool = False, num_tta: int = 5,
                   use_openmax: bool = True, rng=None) -> Dict[str, np.ndarray]:
    from ..train import train_step as ts
    rng = rng if rng is not None else jax.random.key(0)
    if use_tta:
        step = make_tta_eval_step(cfg, num_tta, use_openmax=use_openmax)
    else:
        plain = ts.make_eval_step(cfg.model, use_openmax=use_openmax)
        step = lambda p, b, r: plain(p, b)[0]
    logits_all, labels_all, indices_all = [], [], []
    for batch in loader.epoch(0):
        rng, k = jax.random.split(rng)
        dev = mesh_lib.shard_batch(
            {k2: v for k2, v in batch.items()
             if k2 not in pipeline_mod.EVAL_HOST_KEYS}, mesh)
        logits = step(params, dev, k)
        keep = batch["example_mask"] > 0
        logits_all.append(np.asarray(logits, np.float64)[keep])
        labels_all.append(batch["labels"][keep])
        if "indices" in batch:
            indices_all.append(batch["indices"][keep])
    return {
        "logits": np.concatenate(logits_all) if logits_all else np.zeros((0, cfg.model.num_labels)),
        "labels": np.concatenate(labels_all) if labels_all else np.zeros((0,), np.int64),
        "indices": (np.concatenate(indices_all) if indices_all
                    else np.zeros((0,), np.int32)),
    }


def evaluate_manifest(params, cfg: Config, manifest: str, *,
                      batch_size: int = 8, use_tta: bool = False,
                      num_tta: int = 5, calibrate: bool = False,
                      val_manifest: Optional[str] = None,
                      tokenizer: Optional[Tokenizer] = None,
                      mesh=None, verbose: bool = True) -> Dict:
    tok = tokenizer or get_tokenizer(vocab_size=cfg.model.text.vocab_size)
    mesh = mesh or mesh_lib.mesh_from_config(cfg.mesh)
    # One-time placement of checkpoint-restored (host-numpy) params: else
    # every per-batch jitted call re-uploads the full tree (relay: ~145 s
    # and ~1.6 GB of staged host buffers PER CALL on the flagship).
    params = mesh_lib.shard_params(params, mesh)

    optimal_temp = 1.0
    if calibrate and val_manifest:
        val_loader = BucketedLoader(SERDataset(val_manifest, cfg.data),
                                    batch_size=batch_size, tokenizer=tok,
                                    shuffle=False)
        # calibration pass runs without OpenMax (eval.py:152)
        cal = collect_logits(params, cfg, val_loader, mesh, use_openmax=False)
        optimal_temp = find_optimal_temperature(cal["logits"], cal["labels"])
        if verbose:
            print(f"Optimal temperature: {optimal_temp:.3f}")

    loader = BucketedLoader(SERDataset(manifest, cfg.data),
                            batch_size=batch_size, tokenizer=tok, shuffle=False)
    out = collect_logits(params, cfg, loader, mesh, use_tta=use_tta,
                         num_tta=num_tta, use_openmax=True)
    logits, labels = out["logits"], out["labels"]
    # Calibration scales the SOFTMAX inputs only. `logits` and the energy
    # OOD score stay RAW (temperature-invariant) — the same contract as the
    # serving daemon and interface, so OOD thresholds fitted on this
    # surface's output transfer to production unchanged. preds are argmax
    # of raw logits, identical to the scaled argmax for any T > 0.
    scaled = temperature_scaling(logits, optimal_temp) if calibrate else logits

    e = np.exp(scaled - scaled.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)
    preds = logits.argmax(axis=1)
    energies = np.asarray(om.energy_score(jnp.asarray(logits)))

    names = SIX_NAMES[:cfg.model.num_labels]
    f1 = M.weighted_f1(preds, labels, cfg.model.num_labels)
    cm = M.confusion_matrix(labels, preds, cfg.model.num_labels)
    maxp = probs.max(axis=1)
    results = {
        "weighted_f1": f1,
        "accuracy": M.accuracy(preds, labels),
        "uar": M.unweighted_average_recall(preds, labels, cfg.model.num_labels),
        "temperature": optimal_temp,
        "energy_mean": float(energies.mean()) if len(energies) else 0.0,
        "energy_std": float(energies.std()) if len(energies) else 0.0,
        "confusion_matrix": cm.tolist(),
        "per_class_accuracy": {
            names[i]: float((preds[labels == i] == i).mean())
            for i in range(cfg.model.num_labels) if (labels == i).any()},
        "confidence": {
            "mean": float(maxp.mean()) if len(maxp) else 0.0,
            "std": float(maxp.std()) if len(maxp) else 0.0,
            "high_gt_0.8": float((maxp > 0.8).mean()) if len(maxp) else 0.0,
            "low_lt_0.5": float((maxp < 0.5).mean()) if len(maxp) else 0.0},
        "logits": logits, "labels": labels, "preds": preds,
        "probs": probs, "energies": energies, "indices": out["indices"],
    }

    if verbose:
        print("\n" + "=" * 50 + "\nEVALUATION RESULTS\n" + "=" * 50)
        print(f"Weighted F1 Score: {f1:.4f}")
        print(f"Energy Score - Mean: {results['energy_mean']:.3f}, "
              f"Std: {results['energy_std']:.3f}")
        print(f"Temperature: {optimal_temp:.3f}")
        print("\nClassification Report:")
        print(M.classification_report(labels, preds, names))
        print("\nConfusion Matrix:")
        print(cm)
        print("\nPer-class Accuracy:")
        for k, v in results["per_class_accuracy"].items():
            print(f"  {k}: {v:.3f}")
        c = results["confidence"]
        print(f"\nConfidence Analysis:\n  Mean confidence: {c['mean']:.3f}"
              f"\n  Std confidence: {c['std']:.3f}"
              f"\n  High confidence (>0.8): {c['high_gt_0.8']:.3f}"
              f"\n  Low confidence (<0.5): {c['low_lt_0.5']:.3f}")
    return results


def write_predictions_jsonl(results: Dict, manifest: str,
                            out_path: str) -> int:
    """Per-utterance predictions JSONL from an `evaluate_manifest` result.

    One line per scored clip, joined back to its manifest row via the
    loader-carried indices: audio path, true label, prediction (+name),
    per-class probabilities, max-prob confidence, and the energy OOD score.
    The reference has no batch scoring output at all — its eval aggregates
    (src/eval.py:174-202) and its interface scores one file per process run
    (interface.py:423-470); this is the labeling-pipeline surface between
    the two. Returns the number of lines written."""
    import json as _json

    from ..data.manifest import read_manifest

    rows = read_manifest(manifest)
    if len(results["preds"]) and len(results["indices"]) != len(
            results["preds"]):
        # BucketedLoader groups by duration, so eval order != manifest
        # order — joining positionally would attribute every field to the
        # wrong clip. Fail loudly instead.
        raise ValueError(
            "results carry no per-example manifest indices; the loader "
            "must emit 'indices' to join predictions back to manifest rows")
    names = SIX_NAMES[:results["probs"].shape[1]] if len(
        results["probs"]) else SIX_NAMES
    n = 0
    with open(out_path, "w") as f:
        for i in range(len(results["preds"])):
            idx = int(results["indices"][i])
            row = rows[idx] if 0 <= idx < len(rows) else {}
            p = results["probs"][i]
            rec = {
                "index": idx,
                "audio": row.get("audio"),
                "dataset": row.get("dataset"),
                "label": int(results["labels"][i]),
                "prediction": int(results["preds"][i]),
                "emotion": names[int(results["preds"][i])]
                if int(results["preds"][i]) < len(names)
                else str(int(results["preds"][i])),
                "probabilities": {names[j] if j < len(names) else str(j):
                                  round(float(p[j]), 6)
                                  for j in range(len(p))},
                "confidence": round(float(p.max()), 6),
                "energy": round(float(results["energies"][i]), 6),
                "correct": bool(results["preds"][i] == results["labels"][i]),
            }
            f.write(_json.dumps(rec) + "\n")
            n += 1
    return n

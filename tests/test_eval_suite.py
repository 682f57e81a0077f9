"""Evaluation-suite tests: calibration/openset metrics vs sklearn oracles,
WER vs brute-force edit distance, slicing, robustness generators, few-shot
machinery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multilingual_multimodal_speech_emotion_recognition_tpu.eval import (
    benchmark as bench, calibration as cal, few_shot as fs, openset as osr,
    robustness as rob, slicing, wer as wer_mod)

RNG = np.random.default_rng(3)


def fake_predictions(n=400, num_classes=4, acc=0.7, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, n)
    preds = np.where(rng.uniform(size=n) < acc, labels,
                     rng.integers(0, num_classes, n))
    # correctness-correlated confidences
    base = rng.uniform(0.3, 0.7, n)
    conf = np.clip(base + 0.25 * (preds == labels), 0, 0.999)
    probs = np.full((n, num_classes), 0.0)
    rest = (1 - conf) / (num_classes - 1)
    probs += rest[:, None]
    probs[np.arange(n), preds] = conf
    return labels, preds, probs


# ------------------------------------------------------------- calibration

def test_ece_matches_manual_binning():
    labels, preds, probs = fake_predictions()
    m = cal.compute_calibration_metrics(preds, labels, probs, n_bins=15)
    conf = probs.max(axis=1)
    edges = np.linspace(0, 1, 16)
    ece = 0.0
    for b in range(15):
        in_bin = (conf > edges[b]) & (conf <= edges[b + 1])
        if in_bin.sum():
            ece += in_bin.sum() / len(conf) * abs(
                conf[in_bin].mean() - (preds[in_bin] == labels[in_bin]).mean())
    np.testing.assert_allclose(m.ece, ece, atol=1e-12)
    assert 0 <= m.mce <= 1
    assert cal.calibration_quality(0.01) == "excellent"
    assert cal.calibration_quality(0.2) == "poor"


# ----------------------------------------------------------------- openset

def test_auroc_aupr_match_sklearn():
    from sklearn.metrics import roc_auc_score, auc, precision_recall_curve
    known = RNG.normal(0.7, 0.15, 300)
    unknown = RNG.normal(0.4, 0.2, 200)
    got = osr.auroc(known, unknown)
    y = np.r_[np.ones(300), np.zeros(200)]
    s = np.r_[known, unknown]
    np.testing.assert_allclose(got, roc_auc_score(y, s), atol=1e-9)
    p, r, _ = precision_recall_curve(y, s)
    np.testing.assert_allclose(osr.aupr(known, unknown), auc(r, p), atol=5e-3)


def test_oscr_sweep():
    labels, preds, probs = fake_predictions(n=300)
    conf = probs.max(axis=1)
    # append open-set samples with low confidence
    n_unk = 100
    y = np.r_[labels, -np.ones(n_unk, np.int64)]
    p = np.r_[preds, RNG.integers(0, 4, n_unk)]
    c = np.r_[conf, RNG.uniform(0.2, 0.5, n_unk)]
    res = osr.compute_oscr(c, y, p)
    assert 0 < res["oscr_score"] <= 1
    assert res["auroc"] > 0.5       # knowns are more confident
    assert 0 <= res["fpr_at_95tpr"] <= 1
    assert len(res["oscr_curve"]) == 101


def test_risk_coverage_monotone_coverage():
    labels, preds, probs = fake_predictions()
    conf = probs.max(axis=1)
    rc = osr.risk_coverage_curve(conf, labels, preds)
    cov = np.asarray(rc["coverage_rates"])
    assert (np.diff(cov) <= 1e-12).all()      # coverage shrinks with threshold
    assert rc["optimal_coverage"] > 0.5
    # risk at full coverage equals the overall error rate
    np.testing.assert_allclose(rc["risk_rates"][0],
                               (preds != labels).mean(), atol=1e-12)


# --------------------------------------------------------------------- WER

def test_wer_and_alignment_counts():
    ref = "the quick brown fox jumps"
    hyp = "the quik brown fox over jumps"
    s, d, i = wer_mod.align_counts(ref.split(), hyp.split())
    assert (s, d, i) == (1, 0, 1)
    assert wer_mod.levenshtein(ref.split(), hyp.split()) == 2
    assert wer_mod.wer([ref], [hyp]) == pytest.approx(2 / 5 * 100)
    assert wer_mod.wer(["hello world"], ["hello world"]) == 0.0


def test_asr_tracker_per_language():
    t = wer_mod.ASRPerformanceTracker()
    t.add_result("the cat sat", "the cat sat", language="en", confidence=0.9)
    t.add_result("the dog ran", "the dog walked", language="en", confidence=0.7)
    t.add_result("hola amigo", "hola", language="es", confidence=0.5)
    s = t.summary()
    assert s["per_language"]["en"]["wer"] == pytest.approx(100 / 6)
    assert s["per_language"]["es"]["deletions"] == 1
    assert s["total_words"] == 8
    assert "en" in t.report()


def test_paired_wer_uar():
    r = wer_mod.paired_wer_uar_test({"wer": 30.0, "uar": 0.5},
                                    {"wer": 20.0, "uar": 0.6}, 100)
    assert r["wer_improvement"] == pytest.approx(10.0)
    assert r["wer_significant"] and r["uar_significant"]


# ----------------------------------------------------------------- slicing

def test_slicing_and_transfer():
    labels, preds, probs = fake_predictions(n=200)
    conf = probs.max(axis=1)
    langs = np.where(np.arange(200) % 2 == 0, "en", "hi")
    sl = slicing.slice_by_language(labels, preds, conf, langs)
    assert set(sl) == {"en", "hi"}
    assert sl["en"].sample_count == 100
    tr = slicing.transfer_ratios(sl, "en")
    assert "hi" in tr["transfer_ratios"]

    snr = RNG.uniform(-10, 30, 200)
    ssl = slicing.slice_by_snr(labels, preds, conf, snr)
    assert sum(s.sample_count for s in ssl.values()) == 200
    assert "SNR" in slicing.slicing_report(ssl) or len(ssl) > 0


# -------------------------------------------------------------- robustness

def test_noise_injection_hits_target_snr():
    sr = 16000
    t = np.arange(sr) / sr
    clean = (0.5 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)[None, :]
    mask = np.ones_like(clean)
    for ntype in ("gaussian", "babble", "music"):
        noisy = np.asarray(rob.add_noise_at_snr(
            jax.random.key(0), jnp.asarray(clean), jnp.asarray(mask),
            jnp.asarray([10.0]), noise_type=ntype))
        noise = noisy - clean
        snr = 10 * np.log10((clean ** 2).mean() / (noise ** 2).mean())
        assert abs(snr - 10.0) < 1.0, (ntype, snr)


def test_code_mixing_ratio():
    text = "the cat is on the mat and it is good"
    mixed = rob.code_mix_text(text, 1.0, target_language="hi")
    assert mixed != text
    assert "hai" in mixed or "aur" in mixed or "yeh" in mixed
    assert rob.code_mix_text(text, 0.0) == text


def test_ood_trigger_rate():
    probs = np.array([[0.9, 0.1], [0.45, 0.55], [0.3, 0.7]])
    assert rob.ood_trigger_rate(probs, 0.6) == pytest.approx(1 / 3)
    assert rob.ood_trigger_rate(probs, 0.75) == pytest.approx(2 / 3)


# ---------------------------------------------------------------- few-shot

def test_recovery_rate():
    assert fs.recovery_rate(0.4, 0.5, 0.6) == pytest.approx(50.0)
    assert fs.recovery_rate(0.4, 0.6, 0.6) == pytest.approx(100.0)
    assert fs.recovery_rate(0.6, 0.5, 0.6) == 0.0


def test_select_shots_deterministic():
    s1, e1 = fs.select_shots(100, 10, seed=42)
    s2, _ = fs.select_shots(100, 10, seed=42)
    assert s1 == s2 and len(s1) == 10 and len(e1) == 90
    assert set(s1).isdisjoint(e1)


def test_few_shot_adaptation_learns():
    """Adaptation with frozen encoders moves fusion/classifier and improves
    CE on a fixed tiny batch; frozen subtrees stay bit-identical."""
    from test_model import tiny_config, tiny_batch
    import multilingual_multimodal_speech_emotion_recognition_tpu.models.model as mdl

    cfg = tiny_config()
    params = mdl.init_model(jax.random.key(0), cfg)
    batch = tiny_batch(B=4, T=800, S=10)
    batch["labels"] = jnp.asarray(np.array([0, 1, 2, 3], np.int32))

    adapted = fs.adapt(params, cfg, lambda: [batch], num_epochs=3)
    # frozen: backbones identical
    for k in ("audio_backbone", "text_backbone", "cross", "pool_a"):
        a = jax.tree.leaves(params[k])
        b = jax.tree.leaves(adapted[k])
        assert all(np.array_equal(x, y) for x, y in zip(a, b)), k
    # trained: fusion changed
    changed = any(not np.array_equal(x, y)
                  for x, y in zip(jax.tree.leaves(params["fusion"]),
                                  jax.tree.leaves(adapted["fusion"])))
    assert changed


# --------------------------------------------------------------- benchmark

def test_enhanced_pipeline_orchestrates_all_stages(tmp_path):
    """EnhancedEvaluationPipeline parity (enhanced_evaluation.py:490-685):
    every stage runs when its inputs are present, results persist to
    evaluation_results.json + a text report."""
    from multilingual_multimodal_speech_emotion_recognition_tpu.eval import (
        enhanced_pipeline as ep)
    N = 120
    y_true = RNG.integers(0, 4, N)
    y_pred = np.where(RNG.random(N) < 0.7, y_true, RNG.integers(0, 4, N))
    conf = np.clip(0.5 + 0.4 * (y_true == y_pred) + 0.1 * RNG.random(N), 0, 1)
    unknown = RNG.random(N) < 0.2
    langs = np.where(RNG.random(N) < 0.5, "en", "es").tolist()
    snr = RNG.uniform(0, 30, N)

    res = ep.run_enhanced_evaluation(
        y_true=y_true, y_pred=y_pred, confidence_scores=conf,
        unknown_mask=unknown, languages=langs, snr_values=snr,
        raw_audio_metrics={"wer": 0.30, "uar": 0.55},
        processed_audio_metrics={"wer": 0.22, "uar": 0.62},
        output_dir=str(tmp_path / "enh"))

    assert "wer_uar_analysis" in res
    assert 0.0 <= res["open_set_metrics"]["auroc"] <= 1.0
    assert "oscr_score" in res["open_set_metrics"]
    assert "risk_coverage_auc" in res["risk_coverage_analysis"]
    sl = res["performance_slices"]
    assert "en" in sl and "es" in sl          # language slices
    assert any("dB" in k for k in sl)         # SNR band slices
    assert (tmp_path / "enh" / "evaluation_results.json").exists()
    report = (tmp_path / "enh" / "evaluation_report.txt").read_text()
    assert "ENHANCED EVALUATION REPORT" in report
    assert "Risk-coverage" in report

    # stages are conditional on their inputs, like the reference
    res2 = ep.run_enhanced_evaluation(y_true=y_true, y_pred=y_pred)
    assert "open_set_metrics" not in res2
    assert "wer_uar_analysis" not in res2


def test_benchmark_fn_shape():
    calls = []

    def fn(bs):
        calls.append(bs)
        return np.zeros((bs, 4))

    res = bench.benchmark_fn(fn, batch_sizes=(1, 2), warmup=1, runs=3)
    assert set(res["per_batch_size"]) == {1, 2}
    e = res["per_batch_size"][2]
    assert e["samples_per_sec"] > 0
    assert e["latency_p95_ms"] >= e["latency_p50_ms"] * 0.5
    assert res["scaling"]["best_batch_size"] in (1, 2)
    info = bench.count_params({"w": np.zeros((3, 4), np.float32)})
    assert info["total_params"] == 12


# ----------------------------------------------------- TTA fast path parity

def test_tta_step_text_encode_once_matches_naive_tiling():
    """make_tta_eval_step encodes the text ONCE and tiles the encoded
    sequence (text inputs are identical across TTA views — eval.py:23-41);
    the logits must match tiling the raw text ids through model_forward."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from test_model import tiny_config, tiny_batch

    from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
        Config)
    from multilingual_multimodal_speech_emotion_recognition_tpu.eval import (
        evaluate as ev)
    from multilingual_multimodal_speech_emotion_recognition_tpu.models import (
        model as mdl)
    from multilingual_multimodal_speech_emotion_recognition_tpu.ops import (
        audio_dsp)

    mcfg = tiny_config()
    cfg = Config(model=mcfg)
    params = mdl.init_model(jax.random.key(0), mcfg)
    batch = tiny_batch()
    rng = jax.random.key(7)
    V = 3

    fast = ev.make_tta_eval_step(cfg, num_tta=V, use_openmax=False)
    got = np.asarray(fast(params, batch, rng))

    wave, mask = audio_dsp.tta_expand(rng, batch["audio"],
                                      batch["audio_mask"], num_tta=V)
    tile = lambda x: jnp.concatenate([x] * V, axis=0)
    big = {"audio": wave, "audio_mask": mask,
           "text_ids": tile(batch["text_ids"]),
           "text_mask": tile(batch["text_mask"]),
           "quality_feats": tile(batch["quality_feats"]),
           "cond_feats": tile(batch["cond_feats"])}
    out = mdl.model_forward(params, mcfg, big, deterministic=True,
                            use_openmax=False)
    B = batch["audio"].shape[0]
    want = np.asarray(out.logits.reshape(V, B, -1).mean(axis=0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# -------------------------------------------------- predictions JSONL join

def test_write_predictions_jsonl_requires_indices(tmp_path):
    """BucketedLoader groups by duration, so eval order != manifest order;
    joining positionally would mislabel every clip. Results without
    per-example indices must fail loudly, and out-of-range indices must
    not wrap (rows[-1]) to the wrong manifest row."""
    import json

    from multilingual_multimodal_speech_emotion_recognition_tpu.eval import (
        evaluate as ev)

    man = tmp_path / "m.jsonl"
    man.write_text("".join(
        json.dumps({"audio": f"a{i}.wav", "label": i % 2, "text": "x",
                    "dataset": "t"}) + "\n" for i in range(3)))
    probs = np.full((3, 4), 0.25)
    base = {"preds": np.zeros(3, np.int64), "labels": np.zeros(3, np.int64),
            "probs": probs, "energies": np.zeros(3)}

    with pytest.raises(ValueError, match="indices"):
        ev.write_predictions_jsonl(
            {**base, "indices": np.zeros((0,), np.int32)},
            str(man), str(tmp_path / "p.jsonl"))

    # -1 padding sentinel: row fields must come out empty, not rows[-1]
    out = tmp_path / "p2.jsonl"
    ev.write_predictions_jsonl(
        {**base, "indices": np.array([2, -1, 0], np.int32)},
        str(man), str(out))
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    assert recs[0]["audio"] == "a2.wav"
    assert recs[1]["audio"] is None
    assert recs[2]["audio"] == "a0.wav"

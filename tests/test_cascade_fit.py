"""Cascade threshold fitting (eval/cascade.py + cli/fit_cascade.py).

The fitted `confidence_threshold` must realize exactly the operating
point it reports under CascadeServer's routing rule (escalate iff
student confidence < threshold — serving.py:445-449), including on tied
confidence values where not every escalation count is reachable."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from multilingual_multimodal_speech_emotion_recognition_tpu.eval import cascade

REPO = Path(__file__).resolve().parent.parent


def _realized(conf, stu, tea, t):
    esc = np.asarray(conf) < t
    correct = np.where(esc, tea, stu) if tea is not None else None
    return (float(esc.mean()),
            None if correct is None else float(np.mean(correct)))


def test_budget_fit_hand_computed():
    conf = [0.9, 0.6, 0.3]
    stu = [True, False, False]
    tea = [True, True, True]
    fit = cascade.fit_confidence_threshold(
        conf, stu, correct_teacher=tea, escalation_budget=0.5)
    assert fit["escalation_rate"] == pytest.approx(1 / 3)
    assert fit["accuracy"] == pytest.approx(2 / 3)
    assert fit["accuracy_kind"] == "cascade"
    assert fit["feasible"]
    rate, acc = _realized(conf, stu, tea, fit["confidence_threshold"])
    assert rate == pytest.approx(fit["escalation_rate"])
    assert acc == pytest.approx(fit["accuracy"])


def test_min_accuracy_minimizes_escalations():
    conf = [0.9, 0.6, 0.3]
    stu = [True, False, False]
    tea = [True, True, True]
    fit = cascade.fit_confidence_threshold(
        conf, stu, correct_teacher=tea, min_accuracy=0.9)
    assert fit["accuracy"] >= 0.9
    assert fit["escalation_rate"] == pytest.approx(2 / 3)


def test_infeasible_target_reports_best_within_budget():
    conf = [0.9, 0.6, 0.3]
    stu = [True, False, False]
    tea = [True, True, True]
    fit = cascade.fit_confidence_threshold(
        conf, stu, correct_teacher=tea,
        escalation_budget=0.5, min_accuracy=0.9)
    assert not fit["feasible"]
    assert fit["escalation_rate"] <= 0.5
    assert fit["accuracy"] == pytest.approx(2 / 3)


def test_selective_accuracy_without_teacher():
    conf = [0.9, 0.6, 0.3]
    stu = [True, False, False]
    fit = cascade.fit_confidence_threshold(conf, stu, min_accuracy=1.0)
    assert fit["accuracy_kind"] == "selective"
    # answering only the 0.9 row is the cheapest perfect point
    assert fit["escalation_rate"] == pytest.approx(2 / 3)
    assert fit["accuracy"] == pytest.approx(1.0)


def test_tied_confidences_only_realizable_points():
    conf = [0.5, 0.5, 0.8]
    stu = [False, True, True]
    tea = [True, True, True]
    # escalating exactly 1 row is unreachable with a strict-< threshold;
    # the fit must land on a realizable point and report it exactly
    for budget in (0.0, 1 / 3, 2 / 3, 1.0):
        fit = cascade.fit_confidence_threshold(
            conf, stu, correct_teacher=tea, escalation_budget=budget)
        rate, acc = _realized(conf, stu, tea, fit["confidence_threshold"])
        assert rate == pytest.approx(fit["escalation_rate"])
        assert acc == pytest.approx(fit["accuracy"])
        assert rate <= budget + 1e-12


def test_fit_matches_rule_on_random_data():
    rng = np.random.default_rng(0)
    n = 500
    conf = np.round(rng.uniform(0.25, 1.0, n), 2)     # plenty of ties
    stu = rng.uniform(size=n) < conf                  # calibrated-ish
    tea = rng.uniform(size=n) < 0.9
    fit = cascade.fit_confidence_threshold(
        conf, stu, correct_teacher=tea, escalation_budget=0.2)
    rate, acc = _realized(conf, stu, tea, fit["confidence_threshold"])
    assert rate == pytest.approx(fit["escalation_rate"])
    assert acc == pytest.approx(fit["accuracy"])
    assert rate <= 0.2 + 1e-12
    # escalating the least-confident 20% to a 90% teacher must beat
    # the student alone on this calibrated synthetic
    assert fit["accuracy"] > fit["student_accuracy"]


def test_energy_threshold_quantile():
    rng = np.random.default_rng(1)
    energy = rng.normal(-8.0, 1.0, 1000)
    stu = np.ones(1000, bool)
    fit = cascade.fit_energy_threshold(energy, stu, quantile=0.95)
    assert fit["energy_threshold"] == pytest.approx(
        np.quantile(energy, 0.95))
    assert fit["energy_escalation_rate"] == pytest.approx(0.05, abs=0.01)


def test_fit_from_predictions_joins_by_index():
    stu_rows = [
        {"index": 2, "confidence": 0.9, "correct": True, "energy": -9.0},
        {"index": 0, "confidence": 0.3, "correct": False, "energy": -5.0},
    ]
    tea_rows = [
        {"index": 0, "correct": True},
        {"index": 2, "correct": True},
    ]
    fit = cascade.fit_from_predictions(
        stu_rows, tea_rows, min_accuracy=1.0, energy_quantile=0.99)
    assert fit["accuracy"] == pytest.approx(1.0)
    assert fit["escalation_rate"] == pytest.approx(0.5)
    assert "energy_threshold" in fit
    with pytest.raises(ValueError, match="missing manifest indices"):
        cascade.fit_from_predictions(stu_rows, tea_rows[:1],
                                     min_accuracy=1.0)


def test_requires_a_target():
    with pytest.raises(ValueError, match="escalation_budget"):
        cascade.fit_confidence_threshold([0.5], [True])


def test_cli_end_to_end(tmp_path):
    rng = np.random.default_rng(2)
    stu_path, tea_path = tmp_path / "stu.jsonl", tmp_path / "tea.jsonl"
    with open(stu_path, "w") as fs, open(tea_path, "w") as ft:
        for i in range(200):
            c = float(rng.uniform(0.3, 1.0))
            fs.write(json.dumps({
                "index": i, "confidence": round(c, 3),
                "correct": bool(rng.uniform() < c),
                "energy": float(rng.normal(-8, 1))}) + "\n")
            ft.write(json.dumps({
                "index": i, "correct": bool(rng.uniform() < 0.95)}) + "\n")
    out = tmp_path / "fit.json"
    r = subprocess.run(
        [sys.executable, str(REPO / "cli" / "fit_cascade.py"),
         "--student_predictions", str(stu_path),
         "--teacher_predictions", str(tea_path),
         "--escalation_budget", "0.25", "--energy_quantile", "0.99",
         "--out", str(out)],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu"},
        cwd=str(REPO))
    assert r.returncode == 0, r.stderr
    fit = json.loads(out.read_text())
    assert fit["escalation_rate"] <= 0.25
    assert "energy_threshold" in fit
    assert "--confidence_threshold" in r.stdout

"""Academic evaluation driver test: the 8-part battery end-to-end on a tiny
model + synthetic manifest."""

import json

import numpy as np
import jax
import pytest

from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
    Config, DataConfig, TrainConfig)
from multilingual_multimodal_speech_emotion_recognition_tpu.eval import academic
import multilingual_multimodal_speech_emotion_recognition_tpu.data.audio_io as aio
import multilingual_multimodal_speech_emotion_recognition_tpu.data.manifest as man
import multilingual_multimodal_speech_emotion_recognition_tpu.data.tokenizer as tok_lib
import multilingual_multimodal_speech_emotion_recognition_tpu.models.model as mdl

from test_model import tiny_config

SR = 16000
TEXTS = ["the angry one", "el gato feliz", "the sad words", "plain neutral"]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("acad")
    wavdir = root / "datasets" / "synth"
    wavdir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    items = []
    for i in range(24):
        label = i % 4
        t = np.arange(int(SR * 0.6)) / SR
        x = 0.4 * np.sin(2 * np.pi * [300, 600, 1200, 2400][label] * t)
        x = (x + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
        aio.write_wav(wavdir / f"a{i:02d}.wav", x, SR)
        items.append({"audio": f"synth/a{i:02d}.wav", "text": TEXTS[label],
                      "label": label, "dataset": "synth"})
    man.write_manifest(root / "val.jsonl", items)
    cfg = Config(model=tiny_config(),
                 data=DataConfig(audio_buckets=(1.0,), max_text_tokens=12,
                                 dataset_root=str(root / "datasets")),
                 train=TrainConfig())
    params = mdl.init_model(jax.random.key(0), cfg.model)
    return root, cfg, params


def test_academic_battery(setup, tmp_path):
    root, cfg, params = setup
    tok = tok_lib.HashTokenizer(vocab_size=100)
    res = academic.run_academic_evaluation(
        params, cfg, str(root / "val.jsonl"), batch_size=8, tokenizer=tok,
        output_dir=str(tmp_path / "out"), run_benchmark=True,
        run_few_shot=True, few_shot_shots=[4, 8], few_shot_epochs=1,
        full_ft_f1=0.9,
        run_robustness=True, robustness_snr_levels=[20.0, 0.0],
        robustness_noise_types=("gaussian", "babble"),
        zero_shot_languages=("hi", "bn", "te"),
        verbose=False)

    b = res["baseline"]
    assert b["num_samples"] == 24
    assert 0.0 <= b["weighted_f1"] <= 1.0
    assert 0.0 <= b["accuracy"] <= 1.0

    # cross-lingual: 'es' text detected -> at least two language slices
    langs = res["cross_lingual"]["per_language"]
    assert "en" in langs
    assert "es" in langs
    if "transfer" in res["cross_lingual"]:
        assert "es" in res["cross_lingual"]["transfer"]["transfer_ratios"]

    assert 0.0 <= res["calibration"]["ece"] <= 1.0
    assert res["calibration"]["quality"] in ("excellent", "good", "moderate",
                                             "poor")

    # ASR tracking with hyp=ref simulation -> zero WER
    assert res["asr_tracking"]["overall_wer"] == 0.0
    assert res["asr_tracking"]["total_words"] > 0

    assert "risk_coverage_auc" in res["risk_coverage"]
    assert res["inference_benchmark"]["params"]["total_params"] > 0
    assert len(res["confusion_matrix"]) == 4

    # per-SNR slicing over the device-computed front-end SNR estimates
    assert res["per_snr"], "no SNR band populated"
    assert sum(s["sample_count"] for s in res["per_snr"].values()) == 24

    # part 6: few-shot adaptation ran both K values with recovery rates
    assert [r["num_shots"] for r in res["few_shot"]] == [4, 8]
    for r in res["few_shot"]:
        assert 0.0 <= r["f1_score"] <= 1.0
        assert 0.0 <= r["recovery_rate"] <= 100.0

    # part 7: robustness — noise sweep shape + code-mixing both languages
    noise = res["robustness"]["noise"]
    assert set(noise) == {"gaussian", "babble"}
    for per_snr in noise.values():
        assert set(per_snr) == {"20dB", "0dB"}
        for m in per_snr.values():
            assert 0.0 <= m["weighted_f1"] <= 1.0
            assert "f1_degradation" in m
            assert 0.0 <= m["ood_trigger_rate"] <= 1.0
    cm = res["robustness"]["code_mixing"]
    assert set(cm) == {"hi", "bn"}
    for per_ratio in cm.values():
        assert set(per_ratio) == {"ratio_0", "ratio_0.25", "ratio_0.5",
                                  "ratio_0.75", "ratio_1"}

    # zero-shot cross-lingual: non-English rows + transfer ratios
    zsr = res["zero_shot"]
    assert set(zsr["per_language"]) == {"en", "hi", "bn", "te"}
    assert set(zsr["transfer"]["transfer_ratios"]) == {"hi", "bn", "te"}
    for lang in ("hi", "bn", "te"):
        assert zsr["per_language"][lang]["sample_count"] == 24

    # artifacts written
    out = tmp_path / "out"
    data = json.loads((out / "academic_evaluation.json").read_text())
    assert data["baseline"]["num_samples"] == 24
    assert "few_shot" in data and "robustness" in data
    report = (out / "academic_report.txt").read_text()
    assert "ACADEMIC EVALUATION REPORT" in report
    assert "Few-shot adaptation" in report
    assert "Robustness (noise)" in report
    assert "Per-SNR-band performance" in report
    assert "Zero-shot cross-lingual" in report


def test_zero_shot_translation_and_lid():
    """Native-script rendering is detected by the LID front-end — romanized
    tables would all tag Latin/'en' and the per-language slices would be
    empty (the point of eval/zero_shot.py's native tables)."""
    from multilingual_multimodal_speech_emotion_recognition_tpu.eval import zero_shot as zs
    from multilingual_multimodal_speech_emotion_recognition_tpu.frontend import lid

    text = "the audio sample is good"
    for lang in ("hi", "bn", "te"):
        translated = zs.translate_text(text, lang)
        assert translated != text
        assert lid.detect_language(translated) == lang
    # English stays English
    assert lid.detect_language(text) == "en"

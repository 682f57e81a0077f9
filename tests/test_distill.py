"""Knowledge distillation: a tiny teacher's soft targets train a student
whose checkpoint is a first-class citizen of every downstream surface."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
    Config, DataConfig, TrainConfig, from_json)
import multilingual_multimodal_speech_emotion_recognition_tpu.data.audio_io as aio
import multilingual_multimodal_speech_emotion_recognition_tpu.data.manifest as man
import multilingual_multimodal_speech_emotion_recognition_tpu.data.tokenizer as tok_lib
import multilingual_multimodal_speech_emotion_recognition_tpu.models.model as mdl
import multilingual_multimodal_speech_emotion_recognition_tpu.train.checkpoint as ckpt
import multilingual_multimodal_speech_emotion_recognition_tpu.train.distill as dst
import multilingual_multimodal_speech_emotion_recognition_tpu.train.loop as loop

from test_model import tiny_config

RNG = np.random.default_rng(3)
SR = 16000
FREQS = [250.0, 500.0, 1000.0, 2000.0]
TEXTS = ["angry shouting words", "happy cheerful words",
         "sad crying words", "neutral plain words"]


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("distill_synth")
    wavdir = root / "datasets" / "synth"
    wavdir.mkdir(parents=True)
    items = []
    for i in range(40):
        label = i % 4
        L = int(SR * (0.6 + 0.05 * (i % 4)))
        t = np.arange(L) / SR
        x = 0.5 * np.sin(2 * np.pi * FREQS[label] * t)
        x += 0.01 * RNG.standard_normal(L)
        name = f"d{i:03d}.wav"
        aio.write_wav(wavdir / name, x.astype(np.float32), SR)
        items.append({"audio": f"synth/{name}", "text": TEXTS[label],
                      "label": label, "dataset": "synth"})
    man.write_manifest(root / "train.jsonl", items[:32])
    man.write_manifest(root / "val.jsonl", items[32:])
    return root


def _teacher(root, save_dir):
    """A quickly-trained tiny teacher (same recipe as test_end_to_end)."""
    cfg = Config(
        model=tiny_config(),
        data=DataConfig(audio_buckets=(1.0,), max_text_tokens=12,
                        dataset_root=str(root / "datasets")),
        train=TrainConfig(epochs=6, batch_size=8, lr=5e-3,
                          save_dir=str(save_dir), seed=0))
    tok = tok_lib.HashTokenizer(vocab_size=100)
    result = loop.train(cfg, train_manifest=str(root / "train.jsonl"),
                        val_manifest=str(root / "val.jsonl"),
                        tokenizer=tok, progress=False)
    return result["params"], cfg, tok


def test_student_presets_scale_down():
    teacher = tiny_config()
    for preset in dst.STUDENT_PRESETS:
        s = dst.student_model_config(teacher, preset)
        assert s.num_labels == teacher.num_labels
        assert s.text.vocab_size == teacher.text.vocab_size  # same tokenizer
        assert s.audio.conv_stride == teacher.audio.conv_stride
    with pytest.raises(ValueError, match="preset"):
        dst.student_model_config(teacher, "huge")


def test_distill_end_to_end(synth, tmp_path):
    """Student learns from teacher soft targets: teacher agreement climbs,
    the best checkpoint restores as an ordinary native checkpoint with the
    STUDENT config embedded and no distillation-only params."""
    root = synth
    teacher_params, teacher_cfg, tok = _teacher(root, tmp_path / "t")

    dcfg = dst.DistillConfig(temperature=2.0, alpha=0.8,
                             feature_match_weight=0.1,
                             student_preset="tiny")
    tcfg = dataclasses.replace(teacher_cfg.train, epochs=10, lr=1e-2,
                               save_dir=str(tmp_path / "s"))
    out = dst.distill(teacher_params, teacher_cfg,
                      train_manifest=str(root / "train.jsonl"),
                      val_manifest=str(root / "val.jsonl"),
                      dcfg=dcfg, train_cfg=tcfg, tokenizer=tok,
                      progress=False)

    hist = out["history"]
    assert len(hist) == 10
    # the soft-target loss must fall and teacher agreement must climb
    # (agreement is measured on the last train batch with dropout active,
    # so the bar is a clear-trend one, not a convergence one)
    assert hist[-1]["kd"] < hist[0]["kd"]
    best_agree = max(h["teacher_agreement"] for h in hist)
    assert best_agree > max(0.4, hist[0]["teacher_agreement"])
    # the feature-match head existed during training...
    assert "distill_proj" in out["params"]

    # ...but the saved checkpoint is a clean student checkpoint
    params, _, meta = ckpt.restore_checkpoint(out["best_path"])
    assert "distill_proj" not in params
    saved_cfg = from_json(ckpt.load_config_json(out["best_path"]))
    assert saved_cfg.model.audio.hidden_size == 64  # the tiny student
    assert saved_cfg.model.num_labels == teacher_cfg.model.num_labels

    # the restored student drives the standard eval surface
    from multilingual_multimodal_speech_emotion_recognition_tpu.eval import (
        evaluate as ev)
    res = ev.evaluate_manifest(params, saved_cfg, str(root / "val.jsonl"),
                               batch_size=8, tokenizer=tok, verbose=False)
    assert np.isfinite(res["logits"]).all()
    assert res["weighted_f1"] == pytest.approx(out["best_f1"], abs=0.35)

"""Inference-interface tests: checkpoint-backed predict, detailed analysis,
missing modalities, TTA, JSON export, visualization."""

import json

import numpy as np
import jax
import pytest

from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
    Config, DataConfig, TrainConfig)
from multilingual_multimodal_speech_emotion_recognition_tpu import interface as iface_mod
import multilingual_multimodal_speech_emotion_recognition_tpu.data.audio_io as aio
import multilingual_multimodal_speech_emotion_recognition_tpu.models.model as mdl
import multilingual_multimodal_speech_emotion_recognition_tpu.train.checkpoint as ckpt

from test_model import tiny_config

SR = 16000


@pytest.fixture(scope="module")
def ckpt_and_wav(tmp_path_factory):
    root = tmp_path_factory.mktemp("iface")
    cfg = Config(model=tiny_config(),
                 data=DataConfig(max_text_tokens=12, dataset_root=None),
                 train=TrainConfig())
    params = mdl.init_model(jax.random.key(0), cfg.model)
    from multilingual_multimodal_speech_emotion_recognition_tpu.config import to_json
    path = ckpt.save_checkpoint(root / "ckpt", params=params, epoch=2, f1=0.5,
                                config_json=to_json(cfg))
    t = np.arange(SR) / SR
    wav = (0.4 * np.sin(2 * np.pi * 500 * t)).astype(np.float32)
    wav_path = root / "sample.wav"
    aio.write_wav(wav_path, wav, SR)
    return str(path), str(wav_path)


def test_predict_audio_and_text(ckpt_and_wav):
    ckpt_path, wav_path = ckpt_and_wav
    iface = iface_mod.EmotionRecognitionInterface(ckpt_path)
    assert iface.meta["epoch"] == 2
    res = iface.predict_emotion(wav_path, "I am very happy today")
    assert res["predictions"].shape == (1,)
    assert res["probabilities"].shape == (1, 4)
    np.testing.assert_allclose(res["probabilities"].sum(), 1.0, atol=1e-6)
    assert res["emotion_labels"][0] in iface.emotion_labels
    assert res["modalities"] == {"audio": True, "text": True}
    # detailed analysis fields
    assert res["top_k_predictions"]["probabilities"].shape == (1, 2)
    assert res["entropy"].shape == (1,)
    assert 0 <= res["margin"][0] <= 1
    assert isinstance(res["calibration_error"], float)


def test_missing_modalities(ckpt_and_wav):
    ckpt_path, wav_path = ckpt_and_wav
    iface = iface_mod.EmotionRecognitionInterface(ckpt_path)
    res_a = iface.predict_emotion(wav_path, None)
    assert res_a["modalities"] == {"audio": True, "text": False}
    res_t = iface.predict_emotion(None, "just text")
    assert res_t["modalities"] == {"audio": False, "text": True}
    assert np.isfinite(res_t["logits"]).all()


def test_tta_prediction(ckpt_and_wav):
    ckpt_path, wav_path = ckpt_and_wav
    iface = iface_mod.EmotionRecognitionInterface(ckpt_path)
    res = iface.predict_emotion(wav_path, "some text", use_tta=True,
                                num_tta=3)
    assert res["probabilities"].shape == (1, 4)
    np.testing.assert_allclose(res["probabilities"].sum(), 1.0, atol=1e-6)


def test_export_and_visualize(ckpt_and_wav, tmp_path):
    ckpt_path, wav_path = ckpt_and_wav
    iface = iface_mod.EmotionRecognitionInterface(ckpt_path)
    res = iface.predict_emotion(wav_path, "hello world")
    out = tmp_path / "results.json"
    iface.export_results(res, str(out))
    loaded = json.loads(out.read_text())
    assert loaded["emotion_labels"] == res["emotion_labels"]
    fig_path = tmp_path / "analysis.png"
    iface.visualize_results(res, str(fig_path))
    assert fig_path.exists() and fig_path.stat().st_size > 1000


def test_interface_applies_saved_calibration(ckpt_and_wav, tmp_path):
    """calibration.json beside the checkpoint (written by `cli/eval.py
    --save_temperature`) scales the interface's logits: same argmax,
    flatter probabilities at T>1 — the exact softmax(logits/T) relation."""
    import json
    import shutil

    ckpt_path, wav_path = ckpt_and_wav
    base = iface_mod.EmotionRecognitionInterface(ckpt_path)
    res0 = base.predict_emotion(wav_path, "calibration check")

    cal_dir = tmp_path / "ckpt_cal"
    shutil.copytree(ckpt_path, cal_dir)
    T = 3.0
    (cal_dir / "calibration.json").write_text(json.dumps({"temperature": T}))
    calib = iface_mod.EmotionRecognitionInterface(str(cal_dir))
    assert calib.temperature == T
    res1 = calib.predict_emotion(wav_path, "calibration check")

    assert res1["predictions"][0] == res0["predictions"][0]
    logits = np.log(res0["probabilities"][0])
    e = np.exp(logits / T - (logits / T).max())
    np.testing.assert_allclose(res1["probabilities"][0], e / e.sum(),
                               atol=2e-4)
    assert res1["confidence"][0] < res0["confidence"][0]
    # the returned "logits" stay RAW model logits (temperature divides
    # only the softmax input): energy scores / re-fitting a temperature
    # downstream must see un-scaled values
    np.testing.assert_allclose(res1["logits"], res0["logits"], atol=1e-5)

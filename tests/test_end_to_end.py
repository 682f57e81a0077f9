"""End-to-end integration: train a tiny model on synthetic separable data,
evaluate with TTA + calibration, checkpoint/resume."""

import numpy as np
import jax
import pytest

from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
    Config, DataConfig, TrainConfig)
import multilingual_multimodal_speech_emotion_recognition_tpu.data.audio_io as aio
import multilingual_multimodal_speech_emotion_recognition_tpu.data.manifest as man
import multilingual_multimodal_speech_emotion_recognition_tpu.data.tokenizer as tok_lib
import multilingual_multimodal_speech_emotion_recognition_tpu.train.loop as loop
import multilingual_multimodal_speech_emotion_recognition_tpu.train.checkpoint as ckpt
import multilingual_multimodal_speech_emotion_recognition_tpu.eval.evaluate as ev
import multilingual_multimodal_speech_emotion_recognition_tpu.parallel.mesh as mesh_lib

from test_model import tiny_config

RNG = np.random.default_rng(0)
SR = 16000
FREQS = [250.0, 500.0, 1000.0, 2000.0]  # one tone per class
TEXTS = ["angry shouting words", "happy cheerful words",
         "sad crying words", "neutral plain words"]


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    wavdir = root / "datasets" / "synth"
    wavdir.mkdir(parents=True)
    items = []
    for i in range(48):
        label = i % 4
        L = int(SR * (0.6 + 0.05 * (i % 5)))
        t = np.arange(L) / SR
        x = 0.5 * np.sin(2 * np.pi * FREQS[label] * t)
        x += 0.01 * RNG.standard_normal(L)
        name = f"s{i:03d}_{label}.wav"
        aio.write_wav(wavdir / name, x.astype(np.float32), SR)
        items.append({"audio": f"synth/{name}", "text": TEXTS[label],
                      "label": label, "dataset": "synth"})
    train_items = items[:32]
    val_items = items[32:]
    man.write_manifest(root / "train.jsonl", train_items)
    man.write_manifest(root / "val.jsonl", val_items)
    return root


def _config(root, save_dir, epochs=10, **train_kw) -> Config:
    return Config(
        model=tiny_config(),
        data=DataConfig(audio_buckets=(1.0,), max_text_tokens=12,
                        dataset_root=str(root / "datasets")),
        train=TrainConfig(epochs=epochs, batch_size=8, lr=5e-3,
                          warmup_ratio=0.1, save_dir=str(save_dir),
                          proto_weight=0.05, seed=0, **train_kw))


def test_train_eval_checkpoint_resume(synth_data, tmp_path):
    root = synth_data
    tok = tok_lib.HashTokenizer(vocab_size=100)
    cfg = _config(root, tmp_path / "ckpt", epochs=10)

    result = loop.train(cfg, train_manifest=str(root / "train.jsonl"),
                        val_manifest=str(root / "val.jsonl"),
                        tokenizer=tok, progress=False)
    assert len(result["history"]) == 10
    # the model must learn the trivially separable tones (best epoch; the
    # tiny 4-step epochs make the last-epoch F1 noisy)
    assert result["best_f1"] > 0.5, result["history"]

    # weibull was fitted on the last epoch (activation vectors non-zero)
    av = np.asarray(result["params"]["classifier"]["weibull"]["activation_vectors"])
    assert np.abs(av).sum() > 0

    # checkpoints exist and best_checkpoint resolves
    best = ckpt.best_checkpoint(tmp_path / "ckpt")
    assert best is not None

    # evaluate from the restored checkpoint: plain, TTA, calibrated
    params, _, meta = ckpt.restore_checkpoint(best)
    mesh = mesh_lib.make_mesh()
    res = ev.evaluate_manifest(params, cfg, str(root / "val.jsonl"),
                               batch_size=8, tokenizer=tok, mesh=mesh,
                               verbose=False)
    assert res["weighted_f1"] > 0.5
    assert "confusion_matrix" in res and len(res["per_class_accuracy"]) >= 1

    # per-utterance predictions JSONL: one line per val clip, joined back
    # to its manifest row by index, probabilities summing to 1
    import json as json_mod
    pred_path = tmp_path / "preds.jsonl"
    n = ev.write_predictions_jsonl(res, str(root / "val.jsonl"),
                                   str(pred_path))
    rows = [json_mod.loads(l) for l in pred_path.read_text().splitlines()]
    assert n == len(rows) == len(res["preds"])
    val_rows = man.read_manifest(root / "val.jsonl")
    for r in rows:
        assert r["audio"] == val_rows[r["index"]]["audio"]
        assert r["label"] == val_rows[r["index"]]["label"]
        assert abs(sum(r["probabilities"].values()) - 1.0) < 1e-4
        assert r["correct"] == (r["prediction"] == r["label"])
    acc_jsonl = np.mean([r["correct"] for r in rows])
    assert acc_jsonl == pytest.approx(res["accuracy"])

    res_tta = ev.evaluate_manifest(params, cfg, str(root / "val.jsonl"),
                                   batch_size=8, tokenizer=tok, mesh=mesh,
                                   use_tta=True, num_tta=3, verbose=False)
    assert res_tta["weighted_f1"] > 0.4

    res_cal = ev.evaluate_manifest(params, cfg, str(root / "val.jsonl"),
                                   batch_size=8, tokenizer=tok, mesh=mesh,
                                   calibrate=True,
                                   val_manifest=str(root / "val.jsonl"),
                                   verbose=False)
    assert res_cal["temperature"] > 0
    # calibration scales softmax inputs ONLY: returned logits and the
    # energy OOD score stay raw (temperature-invariant — same contract as
    # the serving daemon), so thresholds fitted here transfer to serving
    np.testing.assert_allclose(res_cal["logits"], res["logits"], atol=1e-9)
    np.testing.assert_allclose(res_cal["energies"], res["energies"],
                               atol=1e-6)

    # resume: run 1 extra epoch from the saved state
    cfg2 = _config(root, tmp_path / "ckpt2", epochs=11,
                   resume_from=str(best))
    result2 = loop.train(cfg2, train_manifest=str(root / "train.jsonl"),
                         val_manifest=str(root / "val.jsonl"),
                         tokenizer=tok, progress=False)
    # resumed training starts after the checkpointed epoch
    assert result2["history"][0]["epoch"] >= 1


def test_early_stop_still_fits_weibull(synth_data, tmp_path):
    """Round-1 hole: the Weibull fit was gated on epoch == epochs-1, so an
    early-stopped run saved checkpoints with all-zero activation vectors and
    OpenMax degraded to scaling every input's logits. The fit must happen on
    loop exit, for both the final and the best-F1 checkpoints (reference
    src/train.py:204-245 fits after the last *executed* epoch)."""
    root = synth_data
    tok = tok_lib.HashTokenizer(vocab_size=100)
    # lr=0 -> params never change -> val F1 plateaus -> early stop at epoch 1
    cfg = _config(root, tmp_path / "es", epochs=6, early_stop_patience=1)
    import dataclasses as dc
    cfg = dc.replace(cfg, train=dc.replace(cfg.train, lr=0.0))

    result = loop.train(cfg, train_manifest=str(root / "train.jsonl"),
                        val_manifest=str(root / "val.jsonl"),
                        tokenizer=tok, progress=False)
    assert len(result["history"]) == 2, "early stop should fire at epoch 1"

    # returned params carry the fit
    av = np.asarray(result["params"]["classifier"]["weibull"]["activation_vectors"])
    assert np.abs(av).sum() > 0

    # BOTH saved checkpoints (best = epoch 0 via strict >, last = epoch 1)
    # carry the fit — whichever one best_checkpoint() resolves under F1 ties
    dirs = sorted(p.parent for p in (tmp_path / "es").glob("epoch_*/meta.json"))
    assert len(dirs) == 2
    for d in dirs:
        params_d, _, _ = ckpt.restore_checkpoint(d)
        av_d = np.asarray(params_d["classifier"]["weibull"]["activation_vectors"])
        assert np.abs(av_d).sum() > 0, f"zero Weibull fit in {d.name}"


def test_train_with_asr_features_flowing(synth_data, tmp_path):
    """--use_asr end to end (train_crema.py:122, text_encoder.py:39-48):
    DataConfig.emit_asr_feats puts 8-dim ASR features in batches and
    ModelConfig.use_asr fuses them into the text encoder — proven by the
    asr_fusion params receiving gradient updates during training."""
    import dataclasses as dc
    root = synth_data
    tok = tok_lib.HashTokenizer(vocab_size=100)
    cfg = _config(root, tmp_path / "asr", epochs=1)
    cfg = dc.replace(cfg,
                     model=dc.replace(cfg.model, use_asr=True),
                     data=dc.replace(cfg.data, emit_asr_feats=True))
    import multilingual_multimodal_speech_emotion_recognition_tpu.models.model as mdl
    init = mdl.init_model(jax.random.key(0), cfg.model)
    before = np.asarray(init["asr_fusion"]["lin"]["kernel"]).copy()
    result = loop.train(cfg, train_manifest=str(root / "train.jsonl"),
                        val_manifest=str(root / "val.jsonl"),
                        tokenizer=tok, initial_params=init, progress=False)
    after = np.asarray(result["params"]["asr_fusion"]["lin"]["kernel"])
    assert not np.array_equal(before, after), \
        "asr_fusion never updated — ASR features did not flow"
    assert np.isfinite(result["history"][0]["train_loss"])


def test_two_phase_training(synth_data, tmp_path):
    """Phase 1 heads-only (frozen backbones), phase 2 full fine-tune
    (reference train_two_phase.py intent; that script is unrunnable)."""
    root = synth_data
    tok = tok_lib.HashTokenizer(vocab_size=100)
    cfg = _config(root, tmp_path / "tp", epochs=1)
    res = loop.train_two_phase(cfg, train_manifest=str(root / "train.jsonl"),
                               val_manifest=str(root / "val.jsonl"),
                               phase1_epochs=1, phase2_epochs=1,
                               phase1_lr=3e-3, phase2_lr=1e-5,
                               tokenizer=tok, progress=False)
    assert len(res["phase1"]["history"]) == 1
    assert len(res["phase2"]["history"]) == 1
    # phase 2 actually updated the (previously frozen) backbones
    import jax
    p1 = res["phase1"]["params"]["audio_backbone"]
    p2 = res["phase2"]["params"]["audio_backbone"]
    changed = any(not np.array_equal(np.asarray(a), np.asarray(b))
                  for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)))
    assert changed
    assert (tmp_path / "tp" / "phase1").exists()
    assert (tmp_path / "tp" / "phase2").exists()


def test_phase2_grad_accum_bounds_microbatch():
    """Phase 2 auto-accum: keep the unfrozen microbatch <= 64 (the
    measured v5e ceiling — docs/PERFORMANCE.md round 5), never lower the
    configured accumulation, always divide the batch."""
    cases = [
        # (batch, configured accum) -> expected
        (16, 1, 1),     # small batch: untouched
        (64, 1, 1),     # at the ceiling: untouched
        (128, 1, 2),    # the monolithic-OOM case: split in two
        (128, 4, 4),    # user asked for more: keep it
        (256, 1, 4),    # ceil(256/64)=4
        (96, 1, 2),     # 96 -> microbatch 48 (2 divides 96)
        (100, 1, 2),    # ceil(100/64)=2 and 2 | 100
    ]
    for batch, accum, want in cases:
        got = loop.phase2_grad_accum(batch, accum)
        assert got == want, (batch, accum, got, want)
        assert batch % got == 0


def test_metrics_match_sklearn():
    from sklearn.metrics import f1_score, balanced_accuracy_score
    import multilingual_multimodal_speech_emotion_recognition_tpu.utils.metrics as M
    labels = RNG.integers(0, 4, 200)
    preds = np.where(RNG.uniform(size=200) < 0.7, labels, RNG.integers(0, 4, 200))
    np.testing.assert_allclose(M.weighted_f1(preds, labels),
                               f1_score(labels, preds, average="weighted"),
                               rtol=1e-9)
    np.testing.assert_allclose(M.macro_f1(preds, labels),
                               f1_score(labels, preds, average="macro"),
                               rtol=1e-9)
    np.testing.assert_allclose(M.unweighted_average_recall(preds, labels),
                               balanced_accuracy_score(labels, preds), rtol=1e-9)


def test_preemption_guard_catches_sigterm():
    import os, signal
    with loop.PreemptionGuard() as g:
        os.kill(os.getpid(), signal.SIGTERM)
        for _ in range(100):     # signal lands at a bytecode boundary
            if g.triggered:
                break
        assert g.triggered
    assert signal.getsignal(signal.SIGTERM) != g._handler  # restored


def test_preemption_checkpoint_and_resume(synth_data, tmp_path):
    """SIGTERM mid-training writes a resumable checkpoint at the next step
    boundary; --resume_from it completes the run (spot-TPU lifecycle)."""
    from pathlib import Path
    root = synth_data
    cfg = _config(root, tmp_path / "pre", epochs=2)
    g = loop.PreemptionGuard()
    g.triggered = True           # as if SIGTERM landed before step 1
    r1 = loop.train(cfg, train_manifest=str(root / "train.jsonl"),
                    val_manifest=str(root / "val.jsonl"), progress=False,
                    guard=g)
    assert r1["preempted"] is True
    pre = Path(r1["checkpoint"])
    assert pre.exists() and pre.name.startswith("preempt_step_")
    assert not r1["history"]     # no epoch completed

    cfg2 = _config(root, tmp_path / "pre", epochs=2,
                   resume_from=str(pre))
    r2 = loop.train(cfg2, train_manifest=str(root / "train.jsonl"),
                    val_manifest=str(root / "val.jsonl"), progress=False)
    assert r2["preempted"] is False
    # the interrupted epoch was restarted and the full run completed
    assert [h["epoch"] for h in r2["history"]] == [0, 1]
    # global step carried through the preempt checkpoint (LR schedule
    # continuity): resumed run starts from the preempted step count
    assert r2["history"][-1]["val_f1"] >= 0.0


def test_preemption_guard_restored_when_loop_raises(synth_data, tmp_path):
    """An exception inside train() must not leak the SIGTERM handler: the
    guard's finally restores the previous handler so a later preemption
    signal still terminates the process (code-review finding)."""
    import signal

    import pytest

    root = synth_data
    cfg = _config(root, tmp_path / "boom", epochs=1)
    before = signal.getsignal(signal.SIGTERM)

    class Boom(RuntimeError):
        pass

    class ExplodingGuard(loop.PreemptionGuard):
        # raise AFTER the handler is installed, like a checkpoint-IO or
        # eval failure early in the loop body would
        @property
        def triggered(self):
            raise Boom("simulated failure inside the train loop")

        @triggered.setter
        def triggered(self, v):
            pass

    with pytest.raises(Boom):
        loop.train(cfg, train_manifest=str(root / "train.jsonl"),
                   val_manifest=str(root / "val.jsonl"), progress=False,
                   guard=ExplodingGuard())
    assert signal.getsignal(signal.SIGTERM) is before

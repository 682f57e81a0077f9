"""Research-halo tests: confidence fusion policy rules, temporal TCN
causality + smoothing, GRL gradient sign, dual-gate OOD logic, loss
phases."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multilingual_multimodal_speech_emotion_recognition_tpu.research import (
    confidence_fusion as cf, cross_lingual as cl, dual_gate_ood as dg,
    loss_integration as li, temporal as tm)

RNG = np.random.default_rng(11)


# --------------------------------------------------- confidence fusion

def _feats(B, **overrides):
    f = cf.default_confidence_features(B)
    return f._replace(**{k: jnp.asarray(v, jnp.float32)
                         for k, v in overrides.items()})


def test_confidence_vector_shape_and_normalization():
    f = _feats(3, snr_db=[25.0, 50.0, 0.0])
    arr = np.asarray(f.to_array())
    assert arr.shape == (3, 14)
    np.testing.assert_allclose(arr[:, 0], [0.5, 1.0, 0.0])


def test_gating_starts_equal():
    p = cf.init_dynamic_gating(jax.random.key(0))
    conf = jnp.asarray(RNG.uniform(size=(5, 14)).astype(np.float32))
    aw, tw = cf.dynamic_gating(p, conf)
    np.testing.assert_allclose(np.asarray(aw), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(aw + tw), 1.0, atol=1e-6)


def test_policy_clamps_rules():
    B = 4
    aw = jnp.full((B, 1), 0.8)
    tw = jnp.full((B, 1), 0.2)
    # row0 fine; row1 low SNR; row2 low ASR conf; row3 low speech prob
    f = _feats(B,
               snr_db=[20.0, 5.0, 20.0, 20.0],
               asr_conf_segment=[1.0, 1.0, 0.2, 1.0],
               speech_prob=[1.0, 1.0, 1.0, 0.3])
    a, t = cf.policy_clamps(aw, tw, f)
    a, t = np.asarray(a), np.asarray(t)
    np.testing.assert_allclose(a + t, 1.0, atol=1e-6)
    assert a[0, 0] == pytest.approx(0.8)
    assert a[1, 0] <= 0.3 + 1e-6                 # rule 1
    assert t[2, 0] <= 0.4 + 1e-6                 # rule 2
    assert a[3, 0] <= 0.2 + 1e-6                 # rule 4


def test_policy_emergency_fallback():
    f = _feats(1, snr_db=[3.0], speech_prob=[0.2],
               asr_conf_segment=[0.1], lid_entropy=[2.3])
    a, t = cf.policy_clamps(jnp.asarray([[0.9]]), jnp.asarray([[0.1]]), f)
    np.testing.assert_allclose(np.asarray(a)[0, 0], 0.5, atol=1e-6)


def test_adaptive_fusion_shapes():
    p = cf.init_adaptive_fusion(jax.random.key(1), audio_dim=32, text_dim=48,
                                proj_dim=64)
    a = jnp.asarray(RNG.standard_normal((5, 32)).astype(np.float32))
    t = jnp.asarray(RNG.standard_normal((5, 48)).astype(np.float32))
    fused, conf, info = cf.adaptive_fusion(p, a, t, _feats(5))
    assert fused.shape == (5, 64)
    assert conf.shape == (5, 1)
    assert (np.asarray(conf) >= 0).all() and (np.asarray(conf) <= 1).all()
    np.testing.assert_allclose(
        np.asarray(info["audio_weight"] + info["text_weight"]), 1.0, atol=1e-5)


# ------------------------------------------------------------- temporal

def test_causal_conv_is_causal():
    p = tm.init_causal_conv(jax.random.key(0), 8, 8, kernel=3)
    x = jnp.asarray(RNG.standard_normal((1, 10, 8)).astype(np.float32))
    y1 = tm.causal_conv(p, x, dilation=2)
    # perturb the future: outputs at earlier positions must not change
    x2 = x.at[:, 7:, :].add(10.0)
    y2 = tm.causal_conv(p, x2, dilation=2)
    np.testing.assert_allclose(np.asarray(y1)[:, :7], np.asarray(y2)[:, :7],
                               atol=1e-5)


def test_tcn_residual_shape():
    p = tm.init_tcn(jax.random.key(0), feature_dim=16, hidden_dim=8)
    x = jnp.asarray(RNG.standard_normal((2, 5, 16)).astype(np.float32))
    y = tm.tcn(p, x)
    assert y.shape == (2, 5, 16)
    assert np.isfinite(np.asarray(y)).all()


def test_confidence_smoothing_rules():
    cur_pred = jnp.asarray([[10.0, 0.0], [10.0, 0.0]])
    hist_pred = jnp.asarray([[0.0, 10.0], [0.0, 10.0]])
    cur_conf = jnp.asarray([[0.95], [0.5]])
    hist_conf = jnp.asarray([[0.5], [0.5]])
    sm, fc = tm.confidence_smoothing(cur_pred, cur_conf, hist_pred, hist_conf)
    sm = np.asarray(sm)
    np.testing.assert_allclose(sm[0], [10.0, 0.0])     # high conf: keep
    assert 0 < sm[1, 0] < 10.0                         # blended
    # final conf floor
    _, fc2 = tm.confidence_smoothing(cur_pred, jnp.asarray([[0.1], [0.1]]),
                                     hist_pred, jnp.asarray([[0.05], [0.05]]))
    assert (np.asarray(fc2) >= tm.MIN_CONFIDENCE - 1e-6).all()


def test_buffer_ring_semantics():
    st = tm.init_buffer(B=1, dim=4)
    for i in range(5):
        st = tm.buffer_push(st, jnp.full((1, 4), float(i)),
                            jnp.asarray([float(i) / 10]))
    assert int(st.count[0]) == 3
    np.testing.assert_allclose(np.asarray(st.features)[0, :, 0], [2, 3, 4])
    np.testing.assert_allclose(np.asarray(tm.buffer_valid_mask(st))[0],
                               [1, 1, 1])


def test_temporal_step_runs():
    p = tm.init_temporal_module(jax.random.key(0), feature_dim=16,
                                num_emotions=4)
    st = tm.init_buffer(B=2, dim=16)
    for i in range(4):
        feat = jnp.asarray(RNG.standard_normal((2, 16)).astype(np.float32))
        conf = jnp.full((2, 1), 0.6)
        st, logits, fc, info = tm.temporal_step(p, st, feat, conf)
    assert logits.shape == (2, 4)
    assert np.isfinite(np.asarray(logits)).all()
    assert info["speaker_changed"].shape == (2,)


# --------------------------------------------------------- cross-lingual

def test_grl_reverses_gradient():
    def f(x):
        return (cl.gradient_reversal(x, 0.5) ** 2).sum()

    x = jnp.asarray([1.0, 2.0])
    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), [-1.0, -2.0])  # -0.5 * 2x


def test_language_head_and_losses():
    p = cl.init_language_head(jax.random.key(0), feature_dim=16)
    feats = jnp.asarray(RNG.standard_normal((6, 16)).astype(np.float32))
    logits = cl.language_adversarial_head(p, feats)
    assert logits.shape == (6, cl.NUM_LANGUAGES)

    emo_logits = jnp.asarray(RNG.standard_normal((6, 4)).astype(np.float32))
    emo_labels = jnp.asarray([0, 1, 2, 3, 0, 1])
    lang_labels = jnp.asarray([0, 0, 1, 1, 2, 2])
    cons = cl.consistency_loss(feats, emo_labels, lang_labels)
    out = cl.cross_lingual_losses(emo_logits, emo_labels, logits,
                                  lang_labels, cons)
    expect = (out["emotion_loss"] - 0.1 * out["language_loss"]
              + out["consistency_loss"])
    np.testing.assert_allclose(float(out["total_loss"]), float(expect),
                               rtol=1e-6)


def test_consistency_loss_zero_without_pairs():
    feats = jnp.asarray(RNG.standard_normal((4, 8)).astype(np.float32))
    # all same language -> no cross-language pairs
    loss = cl.consistency_loss(feats, jnp.asarray([0, 0, 1, 1]),
                               jnp.asarray([0, 0, 0, 0]))
    assert float(loss) == 0.0


def test_adapter_residual():
    p = cl.init_adapter(jax.random.key(0), hidden_dim=16)
    x = jnp.asarray(RNG.standard_normal((3, 16)).astype(np.float32))
    y = cl.adapter(p, x)
    assert y.shape == x.shape


# ------------------------------------------------------------- dual gate

def test_early_ood_reasons():
    q = {"snr_db": jnp.asarray([20.0, 3.0, 20.0]),
         "clipping_percent": jnp.asarray([0.0, 0.0, 50.0]),
         "speech_prob": jnp.asarray([0.9, 0.9, 0.9])}
    r = dg.early_ood(q)
    assert not bool(r.is_ood[0])
    assert bool(r.is_ood[1]) and int(r.reason[1]) == int(dg.OODReason.LOW_SNR)
    assert bool(r.is_ood[2]) and int(r.reason[2]) == int(dg.OODReason.HIGH_CLIPPING)


def test_energy_temperature_calibration():
    logits = jnp.asarray(RNG.standard_normal((100, 4)).astype(np.float32) * 3)
    t = dg.calibrate_energy_temperature(logits)
    assert 0.1 <= t <= 10.0


def test_prototype_update_and_distance():
    key = jax.random.key(0)
    p = dg.init_prototype_detector(key, num_classes=2, feature_dim=4)
    feats = jnp.asarray(np.r_[RNG.normal(0, 0.1, (20, 4)),
                              RNG.normal(5, 0.1, (20, 4))].astype(np.float32))
    labels = jnp.asarray([0] * 20 + [1] * 20)
    p = dg.update_prototypes(p, feats, labels, 2)
    np.testing.assert_allclose(np.asarray(p["prototypes"][0]),
                               np.zeros(4), atol=0.1)
    d, mind = dg.prototype_distances(p, feats[:2])
    assert d.shape == (2, 2)
    assert (np.asarray(d[:, 0]) < np.asarray(d[:, 1])).all()


def test_dual_gate_flow():
    key = jax.random.key(0)
    late = dg.init_late_detector(key, num_classes=4, feature_dim=8)
    thr = dg.init_threshold_manager()
    B = 3
    q = {"snr_db": jnp.asarray([20.0, 2.0, 25.0]),
         "speech_prob": jnp.asarray([0.9, 0.9, 0.9])}
    logits = jnp.asarray(RNG.standard_normal((B, 4)).astype(np.float32))
    feats = jnp.asarray(RNG.standard_normal((B, 8)).astype(np.float32))
    res = dg.dual_gate_ood(late, thr, q, logits, feats)
    assert bool(res.is_ood[1])           # early reject on SNR 2 dB
    assert int(res.stage[1]) == 0
    assert bool(res.computational_savings[1])
    assert res.combined_score if hasattr(res, "combined_score") else True


def test_adaptive_threshold_fallback():
    p = dg.init_threshold_manager()
    p = {"thresholds": p["thresholds"].at[0, 0].set(0.05),
         "global_threshold": p["global_threshold"]}
    t = dg.get_threshold(p, jnp.asarray([0]), jnp.asarray([5.0]))
    np.testing.assert_allclose(np.asarray(t), [0.5])   # extreme -> global


def test_outlier_exposure_loss():
    in_logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
    out_logits = jnp.asarray([[0.0, 0.0, 0.0, 0.0]])
    loss = dg.outlier_exposure_loss(in_logits, jnp.asarray([0]), out_logits)
    assert float(loss) > 0


# ---------------------------------------------------------- loss phases

def test_phase_schedule_and_weights():
    assert li.phase_for_epoch(0) == "representation_learning"
    assert li.phase_for_epoch(50) == "adversarial_training"
    assert li.phase_for_epoch(120) == "calibration"
    w = li.LossWeights().phase_weights("representation_learning")
    assert w["ce_loss"] == 1.0 and w["energy_margin_loss"] == 0.0
    w2 = li.LossWeights().phase_weights("calibration")
    assert w2["temporal_consistency_loss"] == 0.2


def test_energy_margin_loss_directions():
    confident = jnp.asarray([[20.0, 0.0, 0.0, 0.0]])   # low (negative) energy
    diffuse = jnp.asarray([[0.1, 0.1, 0.1, 0.1]])      # higher energy
    l_good = li.energy_margin_loss(confident, jnp.asarray([False]))
    l_bad_ood = li.energy_margin_loss(confident, jnp.asarray([True]))
    assert float(l_good) == pytest.approx(0.0, abs=1e-6)
    assert float(l_bad_ood) > 5.0   # confident on OOD -> big margin penalty


def test_temporal_consistency_gating():
    cur = jnp.asarray([[5.0, 0.0], [5.0, 0.0]])
    prev = jnp.asarray([[0.0, 5.0], [0.0, 5.0]])
    # high confidence everywhere -> loss 0
    l0 = li.temporal_consistency_loss(cur, prev, jnp.asarray([0.9, 0.95]),
                                      jnp.asarray([0.9, 0.9]))
    assert float(l0) == 0.0
    l1 = li.temporal_consistency_loss(cur, prev, jnp.asarray([0.5, 0.9]),
                                      jnp.asarray([0.5, 0.9]))
    assert float(l1) > 0


def test_calibration_loss_zero_when_calibrated():
    conf = jnp.asarray([0.75] * 100)
    correct = jnp.asarray([1.0] * 75 + [0.0] * 25)
    loss = li.confidence_calibration_loss(conf, correct)
    assert float(loss) == pytest.approx(0.0, abs=1e-6)


def test_batch_validator():
    r = li.validate_batch_composition(np.array([0] * 10))
    assert not r["valid"]
    assert any("batch size" in w for w in r["warnings"])
    assert any("classes" in w for w in r["warnings"])
    r2 = li.validate_batch_composition(
        np.array([0, 1, 2, 3] * 8),
        language_ids=np.array([0, 1] * 16),
        is_ood=np.array([True] * 8 + [False] * 24))
    assert r2["valid"]


def test_compute_total_loss_phases():
    comps = {"ce_loss": jnp.asarray(1.0), "energy_margin_loss": jnp.asarray(2.0)}
    out0 = li.compute_total_loss(comps, epoch=0)
    assert float(out0["total_loss"]) == pytest.approx(1.0)   # energy off
    out60 = li.compute_total_loss(comps, epoch=60)
    assert float(out60["total_loss"]) == pytest.approx(1.0 + 0.15 * 2.0)

"""Numerical parity of core JAX ops against PyTorch oracle implementations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import multilingual_multimodal_speech_emotion_recognition_tpu.models.layers as layers
import multilingual_multimodal_speech_emotion_recognition_tpu.models.cross_attention as cma
import multilingual_multimodal_speech_emotion_recognition_tpu.models.fusion as fusion_mod
import multilingual_multimodal_speech_emotion_recognition_tpu.models.prototypes as protos
import multilingual_multimodal_speech_emotion_recognition_tpu.ops.pooling as pooling
import multilingual_multimodal_speech_emotion_recognition_tpu.ops.losses as losses
import multilingual_multimodal_speech_emotion_recognition_tpu.ops.openmax as om

import torch_oracles as oracle

RNG = np.random.default_rng(0)


def test_attentive_stats_pooling_masked():
    B, S, D, H = 3, 11, 16, 128
    x = RNG.standard_normal((B, S, D)).astype(np.float32)
    mask = np.ones((B, S), np.float32)
    mask[0, 7:] = 0
    mask[2, 4:] = 0
    params = pooling.init_attentive_stats_pooling(jax.random.key(1), D, H)
    got = pooling.attentive_stats_pooling(params, jnp.asarray(x), jnp.asarray(mask))
    want = oracle.pooling_oracle(
        x, params["w1"]["kernel"], params["w1"]["bias"],
        params["w2"]["kernel"], params["w2"]["bias"], mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_mha_matches_torch():
    torch = pytest.importorskip("torch")
    E, Hn, B, Sq, Sk = 64, 8, 2, 5, 7
    m = oracle.make_torch_mha(E, Hn, seed=3)
    params = jax.tree.map(jnp.asarray, oracle.mha_params_from_torch(m))
    q = RNG.standard_normal((B, Sq, E)).astype(np.float32)
    k = RNG.standard_normal((B, Sk, E)).astype(np.float32)
    v = RNG.standard_normal((B, Sk, E)).astype(np.float32)
    mask = np.ones((B, Sk), np.float32)
    mask[1, 4:] = 0

    got = layers.mha(params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                     num_heads=Hn, key_padding_mask=jnp.asarray(mask))
    with torch.no_grad():
        want, _ = m(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
                    key_padding_mask=torch.from_numpy(mask) == 0)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-5, atol=2e-5)


def test_cross_modal_attention_shapes_and_mask_invariance():
    B, Sa, St, Da, Dt = 2, 9, 6, 32, 24
    params = cma.init_cross_modal_attention(jax.random.key(0), Da, Dt,
                                            shared_dim=16, num_heads=4)
    a = jnp.asarray(RNG.standard_normal((B, Sa, Da)).astype(np.float32))
    t = jnp.asarray(RNG.standard_normal((B, St, Dt)).astype(np.float32))
    am = jnp.ones((B, Sa))
    tm = jnp.ones((B, St)).at[1, 3:].set(0)

    a_enh, t_enh = cma.cross_modal_attention(params, a, t, am, tm, num_heads=4)
    assert a_enh.shape == (B, Sa, Da) and t_enh.shape == (B, St, Dt)

    # Changing the *content* of padded text tokens must not change outputs.
    t2 = t.at[1, 3:].set(99.0)
    a_enh2, _ = cma.cross_modal_attention(params, a, t2, am, tm, num_heads=4)
    np.testing.assert_allclose(np.asarray(a_enh), np.asarray(a_enh2),
                               rtol=1e-6, atol=1e-6)


def test_fusion_matches_oracle():
    B, Da, Dt, P = 4, 48, 40, 32
    params = fusion_mod.init_fusion(jax.random.key(5), Da, Dt, P)
    a = RNG.standard_normal((B, Da)).astype(np.float32)
    t = RNG.standard_normal((B, Dt)).astype(np.float32)
    got = fusion_mod.fusion(params, jnp.asarray(a), jnp.asarray(t))
    np_params = jax.tree.map(np.asarray, params)
    want = oracle.fusion_oracle(a, t, np_params)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_label_smoothing_ce():
    logits = RNG.standard_normal((16, 4)).astype(np.float32) * 3
    target = RNG.integers(0, 4, 16)
    got = losses.label_smoothing_cross_entropy(jnp.asarray(logits), jnp.asarray(target))
    want = oracle.label_smoothing_ce_oracle(logits, target)
    np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-6)


def test_class_balanced_focal():
    logits = RNG.standard_normal((32, 6)).astype(np.float32) * 2
    target = RNG.integers(0, 6, 32)
    got = losses.class_balanced_focal_loss(jnp.asarray(logits), jnp.asarray(target),
                                           num_classes=6)
    want = oracle.focal_oracle(logits, target, 6)
    # rtol is loose because the effective-number weights involve 1 - 0.9999^c,
    # which in f32 carries ~1e-3 relative rounding noise; our op uses the
    # accurate expm1 form while torch computes the naive difference.
    np.testing.assert_allclose(float(got), want, rtol=3e-3, atol=1e-6)


def test_supcon():
    feats = RNG.standard_normal((12, 32)).astype(np.float32)
    labels = RNG.integers(0, 3, 12)
    got = losses.supcon_loss(jnp.asarray(feats), jnp.asarray(labels))
    want = oracle.supcon_oracle(feats, labels)
    np.testing.assert_allclose(float(got), want, rtol=1e-4, atol=1e-5)


def test_prototype_loss():
    emb = RNG.standard_normal((10, 64)).astype(np.float32) * 4
    labels = RNG.integers(0, 4, 10)
    p = protos.init_prototypes(jax.random.key(2), 4, 64)
    got = protos.prototype_loss(p, jnp.asarray(emb), jnp.asarray(labels))
    want = oracle.prototype_loss_oracle(emb, labels, np.asarray(p["prototypes"]))
    np.testing.assert_allclose(float(got), want, rtol=1e-4, atol=1e-5)


def test_uncertainty_regularizer():
    logits = RNG.standard_normal((8, 4)).astype(np.float32)
    targets = RNG.integers(0, 4, 8)
    unc = RNG.uniform(0, 1, (8, 1)).astype(np.float32)
    got = losses.uncertainty_regularizer(jnp.asarray(unc), jnp.asarray(logits),
                                         jnp.asarray(targets))
    correct = (logits.argmax(-1) == targets).astype(np.float32)
    want = float((unc.squeeze(-1) * correct).mean())
    np.testing.assert_allclose(float(got), want, rtol=1e-6)


def test_openmax_adjust_matches_oracle():
    B, C, D = 9, 4, 32
    feats = RNG.standard_normal((B, D)).astype(np.float32)
    logits = RNG.standard_normal((B, C)).astype(np.float32)
    weibull = {
        "alpha": jnp.full((C,), 2.5),
        "beta": jnp.asarray(RNG.uniform(0.5, 2.0, C).astype(np.float32)),
        "tau": jnp.asarray(RNG.uniform(0.0, 1.0, C).astype(np.float32)),
        "activation_vectors": jnp.asarray(RNG.standard_normal((C, D)).astype(np.float32)),
    }
    got = om.openmax_adjust(weibull, jnp.asarray(feats), jnp.asarray(logits))
    want = oracle.openmax_oracle(feats, logits, np.asarray(weibull["alpha"]),
                                 np.asarray(weibull["beta"]), np.asarray(weibull["tau"]),
                                 np.asarray(weibull["activation_vectors"]))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_fit_weibull_matches_oracle():
    N, C, D = 64, 4, 16
    feats = RNG.standard_normal((N, D)).astype(np.float32)
    labels = RNG.integers(0, C - 1, N)  # leave class C-1 empty on purpose
    got = om.fit_weibull(jnp.asarray(feats), jnp.asarray(labels), C)
    a, b, t, av = oracle.fit_weibull_oracle(feats, labels, C)
    np.testing.assert_allclose(np.asarray(got["alpha"]), a, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["beta"]), b, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["tau"]), t, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["activation_vectors"]), av,
                               rtol=1e-4, atol=1e-5)


def test_legacy_openmax_classifier_semantics():
    """Legacy OpenMaxClassifier (reference classifier.py:309-418): smaller
    MLP head, threshold 0.5, full (1-unknown) scaling, alpha=2.0 /
    beta=std / tau=min fit — numpy re-derivation as the oracle."""
    import multilingual_multimodal_speech_emotion_recognition_tpu.models.classifier as clf
    B, IN, H, C = 7, 24, 16, 4
    params = clf.init_legacy_mlp(jax.random.key(3), IN, C, hidden=H)
    x = RNG.standard_normal((B, IN)).astype(np.float32)

    acts, logits = clf.legacy_mlp_forward(params, jnp.asarray(x))
    npp = jax.tree.map(np.asarray, params)
    h = np.maximum(x @ npp["lin1"]["kernel"] + npp["lin1"]["bias"], 0)
    h = np.maximum(h @ npp["lin2"]["kernel"] + npp["lin2"]["bias"], 0)
    want_logits = h @ npp["lin3"]["kernel"] + npp["lin3"]["bias"]
    np.testing.assert_allclose(np.asarray(acts), h, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(logits), want_logits,
                               rtol=2e-5, atol=2e-5)

    # plain Classifier = same net, logits only
    np.testing.assert_allclose(
        np.asarray(clf.legacy_classifier_forward(params, jnp.asarray(x))),
        want_logits, rtol=2e-5, atol=2e-5)

    # fit: alpha=2.0, beta=std, tau=min (no 1.5x/0.8x)
    labels = RNG.integers(0, C, 64)
    feats = RNG.standard_normal((64, H)).astype(np.float32)
    w = clf.legacy_fit_weibull(jnp.asarray(feats), jnp.asarray(labels), C)
    for c in range(C):
        m = labels == c
        mean = feats[m].mean(0)
        d = np.linalg.norm(feats[m] - mean, axis=1)
        np.testing.assert_allclose(np.asarray(w["alpha"][c]), 2.0)
        np.testing.assert_allclose(np.asarray(w["beta"][c]), d.std(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w["tau"][c]), d.min(),
                                   rtol=1e-4, atol=1e-5)

    # openmax: unknown = max_c WeibullCDF; scale by (1-unknown) iff > 0.5
    params = {**params, "weibull": w}
    adj = clf.legacy_openmax_forward(params, jnp.asarray(x))
    dist = np.linalg.norm(h[:, None, :] - np.asarray(w["activation_vectors"])[None],
                          axis=-1)
    sx = np.maximum(dist - np.asarray(w["tau"])[None], 0)
    cdf = 1 - np.exp(-np.power(sx / np.maximum(np.asarray(w["beta"])[None], 1e-6),
                               np.asarray(w["alpha"])[None]))
    unk = cdf.max(1)
    want = np.where(unk[:, None] > 0.5, want_logits * (1 - unk[:, None]),
                    want_logits)
    np.testing.assert_allclose(np.asarray(adj), want, rtol=2e-5, atol=2e-5)


def test_energy_score():
    logits = RNG.standard_normal((5, 4)).astype(np.float32)
    got = om.energy_score(jnp.asarray(logits))
    want = -np.log(np.exp(logits.astype(np.float64)).sum(axis=1))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)


def test_classifier_head_matches_oracle():
    import multilingual_multimodal_speech_emotion_recognition_tpu.models.classifier as clf
    B, IN, C = 3, 24, 4
    params = clf.init_classifier(jax.random.key(7), IN, C, num_layers=6, base_dim=32)
    x = RNG.standard_normal((B, IN)).astype(np.float32)
    out = clf.classifier_forward(params, jnp.asarray(x), use_openmax=False)
    np_params = jax.tree.map(np.asarray, params)
    logits, feats, sims, unc = oracle.classifier_oracle(x, np_params)
    np.testing.assert_allclose(np.asarray(out.logits), logits, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.features), feats, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.anchor_similarities), sims, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.uncertainty), unc, rtol=2e-5, atol=2e-5)
    assert float(out.anchor_loss) == 0.0  # reference "pull" loss is a no-op


def test_classifier_deep_35_layers_runs():
    import multilingual_multimodal_speech_emotion_recognition_tpu.models.classifier as clf
    params = clf.init_classifier(jax.random.key(0), 512, 4, num_layers=35, base_dim=512)
    x = jnp.asarray(RNG.standard_normal((2, 512)).astype(np.float32))
    out = jax.jit(lambda p, x: clf.classifier_forward(p, x, use_openmax=True))(params, x)
    assert out.logits.shape == (2, 4)
    assert np.isfinite(np.asarray(out.logits)).all()


def test_classifier_dropout_and_remat_paths():
    import multilingual_multimodal_speech_emotion_recognition_tpu.models.classifier as clf
    params = clf.init_classifier(jax.random.key(1), 16, 4, num_layers=4, base_dim=32)
    x = jnp.asarray(RNG.standard_normal((2, 16)).astype(np.float32))
    out_det = clf.classifier_forward(params, x)
    out_remat = clf.classifier_forward(params, x, remat=True)
    np.testing.assert_allclose(np.asarray(out_det.logits),
                               np.asarray(out_remat.logits), rtol=1e-6)
    # stochastic path differs from deterministic and is reproducible
    o1 = clf.classifier_forward(params, x, dropout_key=jax.random.key(3),
                                deterministic=False)
    o2 = clf.classifier_forward(params, x, dropout_key=jax.random.key(3),
                                deterministic=False)
    np.testing.assert_allclose(np.asarray(o1.logits), np.asarray(o2.logits))
    assert not np.allclose(np.asarray(o1.logits), np.asarray(out_det.logits))

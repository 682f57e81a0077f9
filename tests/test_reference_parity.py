"""THE logit-parity gate: run the reference's OWN PyTorch modules.

Unlike tests/test_ops_parity.py (golden values from torch_oracles.py, an
independent re-statement of the reference's semantics), this module imports
the reference's actual source files from /root/reference/src/models/ — pure
torch, no network access needed — instantiates them with seeded random
weights, transplants those exact weights into our JAX parameter trees, and
asserts logit-level agreement. A re-stated oracle could encode the same
misreading twice; the reference's own forward cannot.

Covered, weights-transplanted, f32:
  - CrossModalAttention          (cross_attention.py:6-53)
  - AttentiveStatsPooling        (pooling.py:15-28)
  - FusionLayer                  (fusion.py:5-25)
  - AdvancedOpenMaxClassifier    (classifier.py:155-305) incl. fit_weibull
    buffers and the OpenMax-adjusted inference logits
  - OpenMaxClassifier (legacy)   (classifier.py:309-418)
  - PrototypeMemory.prototype_loss (prototypes.py:5-53)
  - LabelSmoothingCrossEntropy / ClassBalancedFocalLoss / SupConLoss
                                 (losses.py:7-88)
  - the five train.py loss terms (train.py:151-168)
  - composed heads path: (a_seq, t_seq, masks) -> logits via model_heads
    vs the reference's cross -> pool x2 -> fusion -> classifier chain
    (train.py:145-152)

Documented divergence (see PARITY.md): the reference's uncertainty term
`mean(uncertainty * correct)` broadcasts [B,1] x [B] -> [B,B], which equals
mean(u) * mean(correct) — an accidental outer product. We compute the
clearly-intended per-sample mean(u_i * correct_i). The composite-loss test
checks each interpretation against its own implementation.
"""

from __future__ import annotations

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
    ModelConfig)
from multilingual_multimodal_speech_emotion_recognition_tpu.models import (
    classifier as clf, cross_attention as cma, fusion as fus, model as mdl,
    prototypes as proto)
from multilingual_multimodal_speech_emotion_recognition_tpu.ops import (
    losses as jlosses, openmax as jopenmax, pooling as jpool)

from torch_oracles import mha_params_from_torch

REF = "/root/reference/src/models"


def _load_ref(name: str):
    """Import a single reference source file WITHOUT importing the package
    (src/models/__init__.py pulls in transformers/librosa)."""
    spec = importlib.util.spec_from_file_location(f"ref_{name}",
                                                  f"{REF}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


ref_cross = _load_ref("cross_attention")
ref_pool = _load_ref("pooling")
ref_fusion = _load_ref("fusion")
ref_classifier = _load_ref("classifier")
ref_prototypes = _load_ref("prototypes")
ref_losses = _load_ref("losses")

RNG = np.random.default_rng(7)


# ---------------------------------------------------------------------------
# weight transplant: torch module -> our param pytree
# ---------------------------------------------------------------------------

def _lin(m: torch.nn.Linear) -> dict:
    return {"kernel": m.weight.detach().numpy().T.copy(),
            "bias": m.bias.detach().numpy().copy()}


def _ln(m: torch.nn.LayerNorm) -> dict:
    return {"scale": m.weight.detach().numpy().copy(),
            "bias": m.bias.detach().numpy().copy()}


def cross_params_from_torch(m) -> dict:
    return {
        "q_a": _lin(m.q_a), "k_t": _lin(m.k_t), "v_t": _lin(m.v_t),
        "attn_a": mha_params_from_torch(m.attn_a), "out_a": _lin(m.out_a),
        "q_t": _lin(m.q_t), "k_a": _lin(m.k_a), "v_a": _lin(m.v_a),
        "attn_t": mha_params_from_torch(m.attn_t), "out_t": _lin(m.out_t),
        "norm_a": _ln(m.norm_a), "norm_t": _ln(m.norm_t),
    }


def pool_params_from_torch(m) -> dict:
    return {"w1": _lin(m.attention[0]), "w2": _lin(m.attention[2])}


def fusion_params_from_torch(m) -> dict:
    return {
        "proj_a1": _lin(m.proj_a[0]), "proj_a2": _lin(m.proj_a[3]),
        "proj_t1": _lin(m.proj_t[0]), "proj_t2": _lin(m.proj_t[3]),
        "gate_a1": _lin(m.gate_a[0]), "gate_a2": _lin(m.gate_a[2]),
        "gate_t1": _lin(m.gate_t[0]), "gate_t2": _lin(m.gate_t[2]),
    }


def classifier_params_from_torch(m) -> dict:
    """AdvancedOpenMaxClassifier -> our stacked-scan tree.

    Reference block Sequential indices (classifier.py:78-86): 0=LN,
    1=Linear, 2=ReLU, 3=Dropout, 4=Linear, 5=Dropout; per-layer extra LN in
    deep_classifier.layer_norms (=:116-119, our "ln_pre")."""
    dc = m.deep_classifier
    per_layer = []
    for blk, ln in zip(dc.residual_layers, dc.layer_norms):
        per_layer.append({
            "ln_pre": _ln(ln),
            "block_ln": _ln(blk.block[0]),
            "block_lin1": _lin(blk.block[1]),
            "block_lin2": _lin(blk.block[4]),
        })
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *per_layer)
    ac = m.anchor_clustering
    return {
        "input_proj": _lin(dc.input_projection[0]),
        "input_ln": _ln(dc.input_projection[1]),
        "layers": stacked,
        "out_proj1": _lin(dc.output_projection[0]),
        "out_ln": _ln(dc.output_projection[1]),
        "out_proj2": _lin(dc.output_projection[4]),
        "anchor": {
            "class_anchors": ac.class_anchors.detach().numpy().copy(),
            "projection": _lin(ac.anchor_projection[0]),
            "proj_ln": _ln(ac.anchor_projection[1]),
            "temperature": np.asarray(ac.temperature.detach().numpy()),
        },
        "uncertainty": {
            "lin1": _lin(m.uncertainty_head[0]),
            "lin2": _lin(m.uncertainty_head[3]),
        },
        "weibull": weibull_from_torch(m),
    }


def weibull_from_torch(m) -> dict:
    return {
        "alpha": m.weibull_alpha.detach().numpy().copy(),
        "beta": m.weibull_beta.detach().numpy().copy(),
        "tau": m.weibull_tau.detach().numpy().copy(),
        "activation_vectors": m.activation_vectors.detach().numpy().copy(),
    }


def _masks(b, s, min_valid=2):
    lens = RNG.integers(min_valid, s + 1, size=b)
    lens[0] = s  # keep at least one full row
    return (np.arange(s)[None, :] < lens[:, None]).astype(np.float32)


# ---------------------------------------------------------------------------
# per-module gates
# ---------------------------------------------------------------------------

def test_cross_modal_attention_matches_reference():
    torch.manual_seed(0)
    B, Sa, St, D = 3, 11, 7, 64
    ref = ref_cross.CrossModalAttention(D, D, shared_dim=32, num_heads=4,
                                        dropout=0.1).eval()
    a = RNG.standard_normal((B, Sa, D)).astype(np.float32)
    t = RNG.standard_normal((B, St, D)).astype(np.float32)
    am, tm = _masks(B, Sa), _masks(B, St)
    with torch.no_grad():
        ra, rt = ref(torch.from_numpy(a), torch.from_numpy(t),
                     torch.from_numpy(am), torch.from_numpy(tm))
    p = cross_params_from_torch(ref)
    ja, jt = cma.cross_modal_attention(p, jnp.asarray(a), jnp.asarray(t),
                                       jnp.asarray(am), jnp.asarray(tm),
                                       num_heads=4, deterministic=True)
    np.testing.assert_allclose(np.asarray(ja), ra.numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(jt), rt.numpy(), rtol=1e-5,
                               atol=1e-5)


def test_pooling_matches_reference():
    torch.manual_seed(1)
    B, S, D = 4, 9, 48
    ref = ref_pool.AttentiveStatsPooling(D).eval()
    x = RNG.standard_normal((B, S, D)).astype(np.float32)
    m = _masks(B, S)
    with torch.no_grad():
        r = ref(torch.from_numpy(x), torch.from_numpy(m))
    j = jpool.attentive_stats_pooling(pool_params_from_torch(ref),
                                      jnp.asarray(x), jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(j), r.numpy(), rtol=1e-5, atol=1e-6)


def test_fusion_matches_reference():
    torch.manual_seed(2)
    B, Da, Dt, P = 5, 96, 96, 32
    ref = ref_fusion.FusionLayer(Da, Dt, P).eval()
    a = RNG.standard_normal((B, Da)).astype(np.float32)
    t = RNG.standard_normal((B, Dt)).astype(np.float32)
    with torch.no_grad():
        r = ref(torch.from_numpy(a), torch.from_numpy(t))
    j = fus.fusion(fusion_params_from_torch(ref), jnp.asarray(a),
                   jnp.asarray(t), deterministic=True)
    np.testing.assert_allclose(np.asarray(j), r.numpy(), rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def advanced_classifier():
    torch.manual_seed(3)
    ref = ref_classifier.AdvancedOpenMaxClassifier(
        input_dim=40, num_labels=4, num_layers=6, base_dim=64,
        dropout=0.15).eval()
    return ref, classifier_params_from_torch(ref)


def test_advanced_classifier_matches_reference(advanced_classifier):
    ref, params = advanced_classifier
    x = RNG.standard_normal((5, 40)).astype(np.float32)
    with torch.no_grad():
        r_logits, r_unc, r_anchor = ref(torch.from_numpy(x),
                                        use_openmax=False,
                                        return_uncertainty=True)
    out = clf.classifier_forward(params, jnp.asarray(x), use_openmax=False,
                                 deterministic=True)
    np.testing.assert_allclose(np.asarray(out.logits), r_logits.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.uncertainty), r_unc.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(out.anchor_loss), float(r_anchor),
                               atol=1e-7)
    # anchor similarities via the reference's sub-module on OUR features
    # (the reference forward does not return them)
    with torch.no_grad():
        r_sims, _ = ref.anchor_clustering(
            torch.from_numpy(np.asarray(out.features)))
    np.testing.assert_allclose(np.asarray(out.anchor_similarities),
                               r_sims.numpy(), rtol=1e-5, atol=1e-5)


def test_fit_weibull_and_openmax_match_reference(advanced_classifier):
    ref, params = advanced_classifier
    feats = RNG.standard_normal((64, 32)).astype(np.float32)
    labels = RNG.integers(0, 4, size=64)
    labels[:4] = [0, 1, 2, 3]
    ref.fit_weibull(torch.from_numpy(feats), torch.from_numpy(labels))
    ours = jopenmax.fit_weibull(jnp.asarray(feats), jnp.asarray(labels), 4)
    got = {k: np.asarray(v) for k, v in ours.items()}
    want = weibull_from_torch(ref)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)

    # full inference path with OpenMax active (classifier.py:231-233,240-275)
    params = dict(params, weibull=ours)
    x = RNG.standard_normal((8, 40)).astype(np.float32) * 3.0
    with torch.no_grad():
        r_logits = ref(torch.from_numpy(x), use_openmax=True)
    out = clf.classifier_forward(params, jnp.asarray(x), use_openmax=True,
                                 deterministic=True)
    np.testing.assert_allclose(np.asarray(out.logits), r_logits.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_legacy_openmax_classifier_matches_reference():
    torch.manual_seed(4)
    ref = ref_classifier.OpenMaxClassifier(input_dim=24, num_labels=4,
                                           hidden=16).eval()
    params = {
        "lin1": _lin(ref.net[0]), "lin2": _lin(ref.net[3]),
        "lin3": _lin(ref.net[6]),
        "weibull": weibull_from_torch(ref),
    }
    feats = RNG.standard_normal((40, 16)).astype(np.float32)
    labels = RNG.integers(0, 4, size=40)
    labels[:4] = [0, 1, 2, 3]
    ref.fit_weibull(torch.from_numpy(feats), torch.from_numpy(labels))
    params["weibull"] = clf.legacy_fit_weibull(jnp.asarray(feats),
                                               jnp.asarray(labels), 4)
    for k, want in weibull_from_torch(ref).items():
        np.testing.assert_allclose(np.asarray(params["weibull"][k]), want,
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    x = RNG.standard_normal((6, 24)).astype(np.float32) * 2.0
    with torch.no_grad():
        r = ref(torch.from_numpy(x), use_openmax=True)
    j = clf.legacy_openmax_forward(params, jnp.asarray(x), use_openmax=True,
                                   deterministic=True)
    np.testing.assert_allclose(np.asarray(j), r.numpy(), rtol=1e-5, atol=1e-5)

    # plain legacy Classifier shares the net (classifier.py:422-436)
    with torch.no_grad():
        r_plain = ref(torch.from_numpy(x), use_openmax=False)
    j_plain = clf.legacy_classifier_forward(params, jnp.asarray(x),
                                            deterministic=True)
    np.testing.assert_allclose(np.asarray(j_plain), r_plain.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_prototype_loss_matches_reference():
    torch.manual_seed(5)
    ref = ref_prototypes.PrototypeMemory(4, 32)
    emb = (RNG.standard_normal((10, 32)) * 4.0).astype(np.float32)
    labels = RNG.integers(0, 4, size=10)
    with torch.no_grad():
        r = ref.prototype_loss(torch.from_numpy(emb),
                               torch.from_numpy(labels))
    params = {"prototypes": ref.prototypes.detach().numpy().copy()}
    j = proto.prototype_loss(params, jnp.asarray(emb), jnp.asarray(labels))
    np.testing.assert_allclose(float(j), float(r), rtol=1e-5, atol=1e-6)


def test_losses_match_reference():
    logits = (RNG.standard_normal((12, 4)) * 6.0).astype(np.float32)
    labels = RNG.integers(0, 4, size=12)
    with torch.no_grad():
        r_ce = ref_losses.LabelSmoothingCrossEntropy(0.1)(
            torch.from_numpy(logits), torch.from_numpy(labels))
        r_focal = ref_losses.ClassBalancedFocalLoss(num_classes=4)(
            torch.from_numpy(logits), torch.from_numpy(labels))
    j_ce = jlosses.label_smoothing_cross_entropy(jnp.asarray(logits),
                                                 jnp.asarray(labels))
    j_focal = jlosses.class_balanced_focal_loss(jnp.asarray(logits),
                                                jnp.asarray(labels),
                                                num_classes=4)
    np.testing.assert_allclose(float(j_ce), float(r_ce), rtol=1e-5)
    np.testing.assert_allclose(float(j_focal), float(r_focal), rtol=1e-5)

    feats = RNG.standard_normal((12, 16)).astype(np.float32)
    with torch.no_grad():
        r_sup = ref_losses.SupConLoss()(torch.from_numpy(feats),
                                        torch.from_numpy(labels))
    j_sup = jlosses.supcon_loss(jnp.asarray(feats), jnp.asarray(labels))
    np.testing.assert_allclose(float(j_sup), float(r_sup), rtol=1e-5,
                               atol=1e-6)


def test_train_loss_mix_matches_reference(advanced_classifier):
    """The five train.py loss terms (train.py:151-168) computed with the
    reference's own modules vs ours, on the same fused features."""
    ref, params = advanced_classifier
    torch.manual_seed(6)
    proto_ref = ref_prototypes.PrototypeMemory(4, 40)
    fused = RNG.standard_normal((16, 40)).astype(np.float32)
    labels = RNG.integers(0, 4, size=16)

    with torch.no_grad():
        t_fused, t_labels = torch.from_numpy(fused), torch.from_numpy(labels)
        logits, uncertainty, anchor_loss = ref(t_fused, use_openmax=False,
                                               return_uncertainty=True)
        ce = ref_losses.LabelSmoothingCrossEntropy(0.1)(logits, t_labels)
        focal = ref_losses.ClassBalancedFocalLoss(num_classes=4)(logits,
                                                                 t_labels)
        correct = (t_labels == logits.argmax(dim=1)).float()
        # reference quirk (train.py:164): [B,1] x [B] broadcasts to [B,B],
        # so the term equals mean(u) * mean(correct)
        unc_ref = torch.mean(uncertainty * correct)
        assert torch.allclose(unc_ref,
                              uncertainty.mean() * correct.mean(), atol=1e-7)
        proto_l = proto_ref.prototype_loss(t_fused, t_labels)
        ref_total = (ce + 0.3 * focal + 0.1 * anchor_loss +
                     0.05 * unc_ref + 0.01 * proto_l)

    out = clf.classifier_forward(params, jnp.asarray(fused),
                                 use_openmax=False, deterministic=True)
    j_ce = jlosses.label_smoothing_cross_entropy(out.logits,
                                                 jnp.asarray(labels))
    j_focal = jlosses.class_balanced_focal_loss(out.logits,
                                                jnp.asarray(labels),
                                                num_classes=4)
    j_unc = jlosses.uncertainty_regularizer(out.uncertainty, out.logits,
                                            jnp.asarray(labels))
    j_proto = proto.prototype_loss(
        {"prototypes": proto_ref.prototypes.detach().numpy().copy()},
        jnp.asarray(fused), jnp.asarray(labels))

    # each term is computed on its OWN side's logits (the true composite
    # path), so ~1e-5-level logit differences propagate — hence 1e-4 here
    # where the module-level gates above hold 1e-5 on identical inputs
    np.testing.assert_allclose(float(j_ce), float(ce), rtol=1e-4)
    np.testing.assert_allclose(float(j_focal), float(focal), rtol=1e-4)
    np.testing.assert_allclose(float(out.anchor_loss), float(anchor_loss),
                               atol=1e-7)
    np.testing.assert_allclose(float(j_proto), float(proto_l), rtol=1e-5,
                               atol=1e-6)
    # ours is the per-sample product (documented divergence from the [B,B]
    # broadcast); both interpretations are checked against their formulas
    unc_j = np.asarray(out.uncertainty).squeeze(-1)
    corr_j = (np.asarray(out.logits).argmax(-1) == labels).astype(np.float32)
    np.testing.assert_allclose(float(j_unc), float((unc_j * corr_j).mean()),
                               rtol=1e-5, atol=1e-7)
    # and the totals agree when the same uncertainty interpretation is used
    j_total = (float(j_ce) + 0.3 * float(j_focal)
               + 0.1 * float(out.anchor_loss)
               + 0.05 * float(unc_ref) + 0.01 * float(j_proto))
    np.testing.assert_allclose(j_total, float(ref_total), rtol=1e-4,
                               atol=1e-6)


def test_composed_heads_path_matches_reference():
    """One composed check: encoded sequences -> logits through the full
    heads chain, reference modules vs model_heads (train.py:145-152)."""
    torch.manual_seed(8)
    B, Sa, St, D = 2, 13, 6, 768
    r_cross = ref_cross.CrossModalAttention(D, D, 256, 8).eval()
    r_pool_a = ref_pool.AttentiveStatsPooling(D).eval()
    r_pool_t = ref_pool.AttentiveStatsPooling(D).eval()
    r_fusion = ref_fusion.FusionLayer(2 * D, 2 * D, 512).eval()
    r_clf = ref_classifier.AdvancedOpenMaxClassifier(
        input_dim=512, num_labels=4, num_layers=35, base_dim=512).eval()

    a = (RNG.standard_normal((B, Sa, D)) * 0.5).astype(np.float32)
    t = (RNG.standard_normal((B, St, D)) * 0.5).astype(np.float32)
    am, tm = _masks(B, Sa), _masks(B, St)

    with torch.no_grad():
        ae, te = r_cross(torch.from_numpy(a), torch.from_numpy(t),
                         torch.from_numpy(am), torch.from_numpy(tm))
        av = r_pool_a(ae, torch.from_numpy(am))
        tv = r_pool_t(te, torch.from_numpy(tm))
        fused = r_fusion(av, tv)
        r_logits, r_unc, _ = r_clf(fused, use_openmax=False,
                                   return_uncertainty=True)

    params = {
        "cross": cross_params_from_torch(r_cross),
        "pool_a": pool_params_from_torch(r_pool_a),
        "pool_t": pool_params_from_torch(r_pool_t),
        "fusion": fusion_params_from_torch(r_fusion),
        "classifier": classifier_params_from_torch(r_clf),
    }
    cfg = ModelConfig(num_labels=4, compute_dtype="float32")
    out = mdl.model_heads(params, cfg, jnp.asarray(a), jnp.asarray(am),
                          jnp.asarray(t), jnp.asarray(tm),
                          deterministic=True)
    np.testing.assert_allclose(np.asarray(out.fused), fused.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.logits), r_logits.numpy(),
                               rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(out.uncertainty), r_unc.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_feature_projections_match_reference_structure():
    """The learned d->32->d front-end feature projections: quality 8->32->8
    (quality_gates.py:438-444, applied :554), conditioning 12->32->12
    (audio_conditioning.py:455-460, applied :578), ASR 8->32->8
    (asr_integration.py:536-541, applied :598). Those reference files import
    librosa/transformers at module top level (unavailable here), so the
    4-line Sequential is rebuilt verbatim instead of imported."""
    for dim in (8, 12):
        torch.manual_seed(dim)
        seq = torch.nn.Sequential(
            torch.nn.Linear(dim, 32), torch.nn.ReLU(),
            torch.nn.Dropout(0.1), torch.nn.Linear(32, dim)).eval()
        p = jax.tree.map(jnp.asarray,
                         {"lin1": _lin(seq[0]), "lin2": _lin(seq[3])})
        x = RNG.standard_normal((5, dim)).astype(np.float32)
        ours = mdl._feature_proj(p, jnp.asarray(x), dropout_key=None,
                                 deterministic=True)
        with torch.no_grad():
            ref = seq(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5,
                                   atol=1e-6)


def test_feature_projections_are_wired_into_the_encoders():
    """Perturbing each projection's output bias must move the logits —
    guards against the round-2 state where the projections existed only in
    docstrings while raw features were fused directly."""
    from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
        Wav2Vec2Config, XLMRConfig)
    cfg = ModelConfig(
        num_labels=4, adapter_dim=8, shared_dim=16, num_heads=4, proj_dim=32,
        classifier_layers=2, classifier_base_dim=32, frontend_dsp=False,
        use_asr=True,
        audio=Wav2Vec2Config(conv_dim=(8, 8), conv_stride=(10, 8),
                             conv_kernel=(10, 3), hidden_size=16,
                             num_hidden_layers=1, num_attention_heads=4,
                             intermediate_size=32, num_conv_pos_embeddings=16,
                             num_conv_pos_embedding_groups=4,
                             apply_spec_augment=False),
        text=XLMRConfig(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                        num_attention_heads=4, intermediate_size=32,
                        max_position_embeddings=24))
    params = mdl.init_model(jax.random.key(0), cfg)
    assert {"quality_proj", "cond_proj", "asr_proj"} <= set(params)
    B, T, S = 2, 400, 6
    batch = {
        "audio": jnp.asarray(RNG.standard_normal((B, T)).astype(np.float32)),
        "audio_mask": jnp.ones((B, T), jnp.float32),
        "text_ids": jnp.asarray(RNG.integers(2, 50, (B, S)).astype(np.int32)),
        "text_mask": jnp.ones((B, S), jnp.float32),
        "quality_feats": jnp.asarray(RNG.standard_normal((B, 8)).astype(np.float32)),
        "cond_feats": jnp.asarray(RNG.standard_normal((B, 12)).astype(np.float32)),
        "asr_feats": jnp.asarray(RNG.standard_normal((B, 8)).astype(np.float32)),
    }
    base = np.asarray(mdl.model_forward(params, cfg, batch).logits)
    for name in ("quality_proj", "cond_proj", "asr_proj"):
        mod = jax.tree.map(lambda x: x, params)  # shallow-safe deep copy
        mod[name] = dict(mod[name])
        mod[name]["lin2"] = dict(mod[name]["lin2"])
        mod[name]["lin2"]["bias"] = mod[name]["lin2"]["bias"] + 3.0
        moved = np.asarray(mdl.model_forward(mod, cfg, batch).logits)
        assert np.abs(moved - base).max() > 1e-4, name

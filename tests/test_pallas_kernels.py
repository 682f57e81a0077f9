"""Pallas kernel numerics vs the reference JAX implementations
(interpret mode on CPU; real lowering exercised on TPU by bench)."""

import numpy as np
import jax
import jax.numpy as jnp

from multilingual_multimodal_speech_emotion_recognition_tpu.ops import (
    pallas_kernels as pk, pooling as pool_ops)
from multilingual_multimodal_speech_emotion_recognition_tpu.models import (
    classifier as clf)

RNG = np.random.default_rng(5)


def test_residual_stack_matches_scan():
    params = clf.init_classifier(jax.random.key(0), input_dim=64,
                                 num_labels=4, num_layers=5, base_dim=128)
    x = jnp.asarray(RNG.standard_normal((6, 128)).astype(np.float32))
    want = clf._residual_stack(params["layers"], x, dropout_rate=0.0,
                               dropout_key=None, deterministic=True)
    got = pk.residual_stack_pallas(params["layers"], x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_residual_stack_batch_padding():
    params = clf.init_classifier(jax.random.key(1), input_dim=64,
                                 num_labels=4, num_layers=3, base_dim=128)
    for B in (1, 3, 8, 11):
        x = jnp.asarray(RNG.standard_normal((B, 128)).astype(np.float32))
        want = clf._residual_stack(params["layers"], x, dropout_rate=0.0,
                                   dropout_key=None, deterministic=True)
        got = pk.residual_stack_pallas(params["layers"], x)
        assert got.shape == (B, 128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_pooling_matches_reference():
    params = pool_ops.init_attentive_stats_pooling(jax.random.key(0), 64)
    x = jnp.asarray(RNG.standard_normal((5, 40, 64)).astype(np.float32))
    mask = np.ones((5, 40), np.float32)
    mask[1, 25:] = 0
    mask[3, 10:] = 0
    mask = jnp.asarray(mask)
    want = pool_ops.attentive_stats_pooling(params, x, mask)
    got = pk.attentive_stats_pooling_pallas(params, x, mask)
    assert got.shape == (5, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pooling_bf16():
    params = pool_ops.init_attentive_stats_pooling(jax.random.key(2), 64)
    p16 = jax.tree.map(lambda v: v.astype(jnp.bfloat16), params)
    x = jnp.asarray(RNG.standard_normal((4, 16, 64)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    mask = jnp.ones((4, 16), jnp.float32)
    want = pool_ops.attentive_stats_pooling(p16, x, mask)
    got = pk.attentive_stats_pooling_pallas(p16, x, mask)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)


def reference_attention(q, k, v, kv_mask, num_heads):
    B, Sq, D = q.shape
    Skv = k.shape[1]
    Dh = D // num_heads
    qh = q.reshape(B, Sq, num_heads, Dh).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Skv, num_heads, Dh).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Skv, num_heads, Dh).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(Dh)
    s = jnp.where(kv_mask[:, None, None, :] == 0, -1e30, s)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", a, vh)
    return o.transpose(0, 2, 1, 3).reshape(B, Sq, D)


def test_flash_attention_matches_reference():
    B, Sq, Skv, D, H = 2, 40, 56, 32, 4
    q = jnp.asarray(RNG.standard_normal((B, Sq, D)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((B, Skv, D)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((B, Skv, D)).astype(np.float32))
    mask = np.ones((B, Skv), np.float32)
    mask[0, 30:] = 0
    mask[1, 45:] = 0
    mask = jnp.asarray(mask)
    want = reference_attention(q, k, v, mask, H)
    got = pk.flash_attention(q, k, v, mask, num_heads=H,
                             block_q=16, block_k=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_attention_self_attention_and_single_block():
    B, S, D, H = 3, 24, 64, 8
    x = jnp.asarray(RNG.standard_normal((B, S, D)).astype(np.float32))
    mask = jnp.ones((B, S), jnp.float32)
    want = reference_attention(x, x, x, mask, H)
    got = pk.flash_attention(x, x, x, mask, num_heads=H,
                             block_q=128, block_k=128)  # one block
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


# ------------------------------------------------- fused conv-extractor tail

def _tail_reference(convs, x1, *, has_ln, ln_eps=1e-5):
    """The lax.conv loop over layers 1..6 (models/wav2vec2.feature_encoder
    fallback path), starting from the layer-0 output x1."""
    from multilingual_multimodal_speech_emotion_recognition_tpu.models import (
        layers, wav2vec2 as w2v)
    x = x1
    for conv in convs[1:]:
        x = w2v._conv1d(conv, x, 2)
        if has_ln:
            x = layers.layer_norm(conv["ln"], x, eps=ln_eps)
        x = layers.gelu(x)
    return x


def _make_tail_convs(key, C, *, has_ln, has_bias, K0=10):
    ks = (K0, 3, 3, 3, 3, 2, 2)
    convs = []
    for i, K in enumerate(ks):
        cin = 1 if i == 0 else C
        k = jax.random.split(key, len(ks))[i]
        conv = {"kernel": 0.1 * jax.random.normal(k, (K, cin, C))}
        if has_bias:
            conv["bias"] = 0.1 * jax.random.normal(k, (C,))
        if has_ln:
            conv["ln"] = {"scale": 1.0 + 0.1 * jax.random.normal(k, (C,)),
                          "bias": 0.1 * jax.random.normal(k, (C,))}
        convs.append(conv)
    return convs


def test_conv_tail_matches_lax_conv_loop():
    """Interpret-mode parity of the fused tail vs the six-lax.conv loop,
    across norm modes, bias presence, odd lengths, and both dtypes."""
    C = 128
    for case, (has_ln, has_bias, T1, dtype, tol) in enumerate([
            (False, False, 3199, np.float32, 1e-5),   # base geometry (1 s)
            (True, True, 3199, np.float32, 1e-5),     # large geometry
            (False, False, 1030, np.float32, 1e-5),   # sub-tile + ragged
            (False, False, 3199, jnp.bfloat16, 4e-2), # serving dtype
    ]):
        convs = _make_tail_convs(jax.random.key(case), C,
                                 has_ln=has_ln, has_bias=has_bias)
        x1 = jax.random.normal(jax.random.key(100 + case),
                               (2, T1, C)).astype(dtype)
        convs = jax.tree.map(lambda a: a.astype(dtype), convs)
        want = np.asarray(_tail_reference(convs, x1, has_ln=has_ln),
                          np.float32)
        got = np.asarray(pk.conv_tail_pallas(convs, x1, has_ln=has_ln),
                         np.float32)
        assert got.shape == want.shape, (case, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol,
                                   err_msg=f"case {case}")


def test_conv_tail_supported_gating():
    assert pk.conv_tail_supported((10, 3, 3, 3, 3, 2, 2),
                                  (5, 2, 2, 2, 2, 2, 2), (512,) * 7)
    # tiny test configs / non-matching stacks fall back to lax.conv
    assert not pk.conv_tail_supported((10, 3), (10, 8), (8, 8))
    assert not pk.conv_tail_supported((10, 3, 3, 3, 3, 2, 2),
                                      (5, 2, 2, 2, 2, 2, 2), (512,) * 6 + (256,))
    assert not pk.conv_tail_supported((10, 3, 3, 3, 3, 2, 2),
                                      (5, 2, 2, 2, 2, 2, 2), (100,) * 7)


def test_feature_encoder_fused_path_matches(monkeypatch):
    """feature_encoder with the fused path forced on equals the lax.conv
    path bit-for-tolerance, including the frame-mask lengths."""
    from multilingual_multimodal_speech_emotion_recognition_tpu.models import (
        wav2vec2 as w2v)
    from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
        Wav2Vec2Config)
    C = 128
    cfg = Wav2Vec2Config(conv_dim=(C,) * 7, conv_stride=(5, 2, 2, 2, 2, 2, 2),
                         conv_kernel=(10, 3, 3, 3, 3, 2, 2), hidden_size=32,
                         num_hidden_layers=1, num_attention_heads=4,
                         intermediate_size=64)
    params = {"convs": _make_tail_convs(jax.random.key(7), C, has_ln=False,
                                        has_bias=False),
              "group_norm": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))}}
    wave = jax.random.normal(jax.random.key(8), (3, 16000), jnp.bfloat16)
    mask = np.ones((3, 16000), np.float32)
    mask[1, 9000:] = 0
    mask = jnp.asarray(mask)

    want, fm_want = w2v.feature_encoder(params, cfg, wave, mask,
                                        allow_fused=False)
    monkeypatch.setattr(pk, "use_pallas", lambda: True)
    monkeypatch.setattr(pk, "_interpret", lambda: True)  # interpret on CPU
    got, fm_got = w2v.feature_encoder(params, cfg, wave, mask,
                                      allow_fused=True)
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(fm_got), np.asarray(fm_want))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=4e-2, atol=4e-2)


def test_conv_tail_t1_exceeding_padded_length():
    """T1 can exceed n_tiles*64*f7 + HALO when T7 divides f7 exactly and
    the conv floor-arithmetic leaves 33..78 surplus frames (e.g. a 3.85 s
    clip) — those trailing frames feed no valid output and must be
    dropped, not crash jnp.pad with a negative width."""
    C = 128
    convs = _make_tail_convs(jax.random.key(9), C, has_ln=False,
                             has_bias=False)
    # T1=1057 -> T7=16 (== f7), T1p=1056 < T1: the regression case
    x1 = jax.random.normal(jax.random.key(10), (1, 1057, C))
    want = np.asarray(_tail_reference(convs, x1, has_ln=False))
    got = np.asarray(pk.conv_tail_pallas(convs, x1, has_ln=False, f7=16))
    assert got.shape == want.shape == (1, 16, C)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

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

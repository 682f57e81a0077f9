"""Sequence-parallel ring attention vs the dense encoder stack.

Runs on the virtual 8-device CPU mesh (conftest). The ring decomposition
must reproduce the dense `_encoder_stack` on every valid frame, including
ragged sequence lengths (padding keys masked), non-divisible S (internal
padding), and both encoder norm variants.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import multilingual_multimodal_speech_emotion_recognition_tpu.models.wav2vec2 as w2v
from multilingual_multimodal_speech_emotion_recognition_tpu.parallel import mesh as mesh_lib
from multilingual_multimodal_speech_emotion_recognition_tpu.parallel.sequence import (
    encoder_stack_sequence_parallel)

RNG = np.random.default_rng(7)


def _tiny_cfg(stable_ln=False, layers=3):
    return w2v.Wav2Vec2Config(
        conv_dim=(8,), conv_stride=(5,), conv_kernel=(10,),
        hidden_size=32, num_hidden_layers=layers, num_attention_heads=4,
        intermediate_size=64, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, do_stable_layer_norm=stable_ln,
        apply_spec_augment=False)


def _dense(stacked, cfg, h, frame_mask):
    bias = jnp.where(frame_mask[:, None, None, :] == 0, -jnp.inf, 0.0)
    return w2v._encoder_stack(stacked, cfg, h, bias, dropout_key=None,
                              deterministic=True, remat=False)


@pytest.mark.parametrize("stable_ln", [False, True])
@pytest.mark.parametrize("S", [32, 29])  # divisible and padded-to-divisible
def test_ring_stack_matches_dense(stable_ln, S):
    cfg = _tiny_cfg(stable_ln)
    params = w2v.init_wav2vec2(jax.random.key(0), cfg)
    stacked = params["layers"]

    B, E = 4, cfg.hidden_size
    h = jnp.asarray(RNG.standard_normal((B, S, E)).astype(np.float32))
    lengths = [S, S - 3, S // 2, 5]
    frame_mask = jnp.asarray(
        (np.arange(S)[None, :] < np.asarray(lengths)[:, None])
        .astype(np.float32))

    mesh = mesh_lib.make_mesh(data=2, model=4)
    got = encoder_stack_sequence_parallel(stacked, cfg, h, frame_mask, mesh)
    want = _dense(stacked, cfg, h, frame_mask)

    valid = np.asarray(frame_mask).astype(bool)
    np.testing.assert_allclose(np.asarray(got)[valid], np.asarray(want)[valid],
                               rtol=2e-4, atol=2e-5)


def test_ring_stack_seq_only_mesh():
    """All 8 devices on the sequence axis (no batch sharding)."""
    cfg = _tiny_cfg()
    params = w2v.init_wav2vec2(jax.random.key(1), cfg)
    stacked = params["layers"]
    B, S, E = 2, 40, cfg.hidden_size
    h = jnp.asarray(RNG.standard_normal((B, S, E)).astype(np.float32))
    frame_mask = jnp.ones((B, S), jnp.float32)

    mesh = mesh_lib.make_mesh(data=1, model=8)
    got = encoder_stack_sequence_parallel(stacked, cfg, h, frame_mask, mesh)
    want = _dense(stacked, cfg, h, frame_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_ring_stack_rejects_wavlm():
    cfg = _tiny_cfg()
    cfg = w2v.Wav2Vec2Config(**{**cfg.__dict__, "gated_relpos_bias": True})
    params = w2v.init_wav2vec2(jax.random.key(2), cfg)
    mesh = mesh_lib.make_mesh(data=2, model=4)
    h = jnp.zeros((2, 16, cfg.hidden_size))
    with pytest.raises(AssertionError):
        encoder_stack_sequence_parallel(params["layers"], cfg, h,
                                        jnp.ones((2, 16)), mesh)

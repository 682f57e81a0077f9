"""Full-model forward and mesh-sharded execution tests (small config)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from multilingual_multimodal_speech_emotion_recognition_tpu.config import ModelConfig
from multilingual_multimodal_speech_emotion_recognition_tpu.models.wav2vec2 import Wav2Vec2Config
from multilingual_multimodal_speech_emotion_recognition_tpu.models.xlmr import XLMRConfig
import multilingual_multimodal_speech_emotion_recognition_tpu.models.model as mdl
import multilingual_multimodal_speech_emotion_recognition_tpu.parallel.mesh as mesh_lib

RNG = np.random.default_rng(7)


def tiny_config(**kw) -> ModelConfig:
    kw.setdefault("frontend_dsp", False)  # unit tests feed feats explicitly
    return ModelConfig(
        num_labels=4, adapter_dim=8, shared_dim=16, num_heads=4, proj_dim=32,
        classifier_layers=3, classifier_base_dim=32,
        # stride product 80 keeps CPU-test attention tiny (16 kHz -> 200 fps)
        audio=Wav2Vec2Config(conv_dim=(8, 8), conv_stride=(10, 8),
                             conv_kernel=(10, 3), hidden_size=16,
                             num_hidden_layers=2, num_attention_heads=4,
                             intermediate_size=32, num_conv_pos_embeddings=16,
                             num_conv_pos_embedding_groups=4,
                             apply_spec_augment=False),
        text=XLMRConfig(vocab_size=100, hidden_size=16, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=32,
                        max_position_embeddings=40),
        **kw)


def tiny_batch(B=4, T=800, S=10):
    audio = RNG.standard_normal((B, T)).astype(np.float32)
    audio_mask = np.ones((B, T), np.float32)
    audio_mask[1, 600:] = 0
    ids = RNG.integers(2, 100, (B, S)).astype(np.int32)
    text_mask = np.ones((B, S), np.float32)
    ids[2, 6:] = 1
    text_mask[2, 6:] = 0
    return {
        "audio": jnp.asarray(audio), "audio_mask": jnp.asarray(audio_mask),
        "text_ids": jnp.asarray(ids), "text_mask": jnp.asarray(text_mask),
        "quality_feats": jnp.asarray(RNG.standard_normal((B, 8)).astype(np.float32)),
        "cond_feats": jnp.asarray(RNG.standard_normal((B, 12)).astype(np.float32)),
    }


def test_model_forward_shapes_and_finiteness():
    cfg = tiny_config()
    params = mdl.init_model(jax.random.key(0), cfg)
    batch = tiny_batch()
    out = jax.jit(lambda p, b: mdl.model_forward(p, cfg, b))(params, batch)
    B = batch["audio"].shape[0]
    assert out.logits.shape == (B, 4)
    assert out.uncertainty.shape == (B, 1)
    assert out.fused.shape == (B, 32)
    for leaf in out:
        assert np.isfinite(np.asarray(leaf)).all()


def test_model_grad_flows_everywhere_except_frozen_choice():
    cfg = tiny_config()
    params = mdl.init_model(jax.random.key(0), cfg)
    batch = tiny_batch()
    labels = jnp.asarray(RNG.integers(0, 4, 4))

    def loss_fn(p):
        out = mdl.model_forward(p, cfg, batch, deterministic=True)
        onehot = jax.nn.one_hot(labels, 4)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(out.logits) * onehot, -1))

    g = jax.grad(loss_fn)(params)
    # adapters and heads must receive gradient
    for name in ["audio_adapter", "text_adapter", "cross", "fusion", "classifier"]:
        sq = jax.tree.reduce(lambda a, b: a + b,
                             jax.tree.map(lambda x: float(jnp.sum(jnp.square(x))),
                                          g[name]))
        assert sq > 0, name


def test_model_bfloat16_path():
    cfg = tiny_config(compute_dtype="bfloat16")
    params = mdl.init_model(jax.random.key(0), cfg)
    out = jax.jit(lambda p, b: mdl.model_forward(p, cfg, b))(params, tiny_batch())
    assert out.logits.dtype == jnp.float32  # classifier stays f32
    assert np.isfinite(np.asarray(out.logits)).all()


def test_model_sharded_over_8_device_mesh():
    cfg = tiny_config()
    params = mdl.init_model(jax.random.key(0), cfg)
    mesh = mesh_lib.make_mesh(data=4, model=2)
    params = mesh_lib.shard_params(params, mesh)
    batch = mesh_lib.shard_batch(tiny_batch(B=8), mesh)

    @jax.jit
    def fwd(p, b):
        return mdl.model_forward(p, cfg, b)

    out = fwd(params, batch)
    assert out.logits.shape == (8, 4)
    assert np.isfinite(np.asarray(out.logits)).all()
    # and a sharded grad step
    labels = jnp.zeros((8,), jnp.int32)

    @jax.jit
    def gstep(p, b):
        def loss(p):
            o = mdl.model_forward(p, cfg, b)
            return jnp.mean(jnp.sum(jnp.square(o.logits), -1))
        return jax.grad(loss)(p)

    g = gstep(params, batch)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_hf_backbone_swap_into_full_model():
    import torch
    from transformers import Wav2Vec2Config as HFW, Wav2Vec2Model
    from transformers import XLMRobertaConfig as HFX, XLMRobertaModel
    torch.manual_seed(0)
    cfg = tiny_config()
    hw = HFW(hidden_size=16, num_hidden_layers=2, num_attention_heads=4,
             intermediate_size=32, conv_dim=(8, 8), conv_stride=(5, 2),
             conv_kernel=(10, 3), num_conv_pos_embeddings=16,
             num_conv_pos_embedding_groups=4, feat_extract_norm="group",
             do_stable_layer_norm=False, apply_spec_augment=False)
    hx = HFX(vocab_size=100, hidden_size=16, num_hidden_layers=2,
             num_attention_heads=4, intermediate_size=32,
             max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
             layer_norm_eps=1e-5)
    tm_a = Wav2Vec2Model(hw).eval()
    tm_t = XLMRobertaModel(hx, add_pooling_layer=False).eval()

    params = mdl.init_model(jax.random.key(0), cfg)
    params = mdl.load_pretrained_backbones(
        params, wav2vec2_state=tm_a.state_dict(), xlmr_state=tm_t.state_dict())
    out = mdl.model_forward(params, cfg, tiny_batch())
    assert np.isfinite(np.asarray(out.logits)).all()


def test_remat_policies_identical_values_and_grads():
    """remat_encoders in {True/"full", "dots", False/"none"} is a pure
    memory/recompute trade (models/remat.py): forward values and gradients
    must be bit-comparable across policies."""
    import dataclasses

    batch = tiny_batch()
    params = mdl.init_model(jax.random.key(3), tiny_config())

    def run(policy):
        cfg = tiny_config(remat_encoders=policy)

        def loss(p):
            out = mdl.model_forward(p, cfg, batch, deterministic=True)
            return (out.logits ** 2).mean()

        v, g = jax.value_and_grad(loss)(params)
        gsum = sum(float(np.abs(np.asarray(l)).sum())
                   for l in jax.tree_util.tree_leaves(g))
        return float(v), gsum

    base = run(True)
    assert base[1] > 0.0
    for policy in ("full", "dots", False, "none"):
        v, gsum = run(policy)
        np.testing.assert_allclose(v, base[0], rtol=1e-6, err_msg=str(policy))
        np.testing.assert_allclose(gsum, base[1], rtol=1e-5,
                                   err_msg=str(policy))

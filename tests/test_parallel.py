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


def _dense(stacked, cfg, h, frame_mask, params=None):
    bias = jnp.where(frame_mask[:, None, None, :] == 0, -jnp.inf, 0.0)
    pos_bias = (w2v.relative_position_bias(params, cfg, h.shape[1])
                if cfg.gated_relpos_bias else None)
    return w2v._encoder_stack(stacked, cfg, h, bias, dropout_key=None,
                              deterministic=True, remat=False,
                              pos_bias=pos_bias)


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


def test_shard_batch_compact_audio_lossless():
    """int16 wire compression must be bit-exact and transparent; non-PCM16
    audio must fall back to the plain f32 transfer."""
    mesh = mesh_lib.make_mesh(data=4, model=2)
    B, T = 8, 1600
    pcm = RNG.integers(-32768, 32768, (B, T)).astype(np.float32) / 32768.0
    lengths = RNG.integers(1, T + 1, B)
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)
    pcm = pcm * mask
    batch = {"audio": pcm, "audio_mask": mask,
             "labels": np.arange(B, dtype=np.int32)}

    dev = mesh_lib.shard_batch(batch, mesh)
    np.testing.assert_array_equal(np.asarray(dev["audio"]), pcm)
    np.testing.assert_array_equal(np.asarray(dev["audio_mask"]), mask)
    np.testing.assert_array_equal(np.asarray(dev["labels"]), batch["labels"])

    # non-PCM16-exact samples: compaction declines, values pass unchanged
    odd = batch | {"audio": (pcm + 1e-7).astype(np.float32)}
    dev2 = mesh_lib.shard_batch(odd, mesh)
    np.testing.assert_array_equal(np.asarray(dev2["audio"]), odd["audio"])

    # non-prefix mask: compaction declines
    holey = dict(batch)
    m2 = mask.copy()
    m2[0, 0] = 0.0
    m2[0, 1] = 1.0
    holey["audio_mask"] = m2
    dev3 = mesh_lib.shard_batch(holey, mesh)
    np.testing.assert_array_equal(np.asarray(dev3["audio_mask"]), m2)


@pytest.mark.parametrize("S", [32, 27])
def test_ring_stack_wavlm_gated_relpos(S):
    """WavLM variant: the per-ring-step bias blocks must reassemble the
    dense gated relative-position bias exactly (incl. internal padding)."""
    base = _tiny_cfg(stable_ln=True)
    cfg = w2v.Wav2Vec2Config(**{
        **base.__dict__, "gated_relpos_bias": True,
        "num_buckets": 16, "max_bucket_distance": 20})
    params = w2v.init_wav2vec2(jax.random.key(2), cfg)
    # random (not zero-init) bias table so the test actually discriminates
    rel = jax.random.normal(jax.random.key(3),
                            params["rel_attn_embed"].shape) * 0.1
    params["rel_attn_embed"] = rel

    B = 3
    h = jnp.asarray(RNG.standard_normal((B, S, cfg.hidden_size))
                    .astype(np.float32))
    lengths = [S, S - 5, 4]
    frame_mask = jnp.asarray(
        (np.arange(S)[None, :] < np.asarray(lengths)[:, None])
        .astype(np.float32))

    mesh = mesh_lib.make_mesh(data=1, model=8)
    got = encoder_stack_sequence_parallel(
        params["layers"], cfg, h, frame_mask, mesh,
        rel_attn_embed=params["rel_attn_embed"], batch_axis=None)
    want = _dense(params["layers"], cfg, h, frame_mask, params)

    valid = np.asarray(frame_mask).astype(bool)
    np.testing.assert_allclose(np.asarray(got)[valid], np.asarray(want)[valid],
                               rtol=2e-4, atol=2e-5)

    # the argument contract is still enforced both ways
    with pytest.raises(AssertionError):
        encoder_stack_sequence_parallel(params["layers"], cfg, h,
                                        frame_mask, mesh)


def test_multislice_folded_mesh_matches_flat():
    """dcn_data>1 folds a slice-major DCN axis into 'data'; on virtual
    devices the SPMD program must be identical to the flat mesh (the DCN
    layout only changes physical placement), so sharded forward logits
    must match exactly."""
    import multilingual_multimodal_speech_emotion_recognition_tpu.models.model as mdl
    from test_model import tiny_batch, tiny_config

    cfg = tiny_config()
    params = mdl.init_model(jax.random.key(0), cfg)
    batch = tiny_batch(B=8)

    def run(mesh):
        p = mesh_lib.shard_params(params, mesh)
        b = mesh_lib.shard_batch(batch, mesh)

        @jax.jit
        def fwd(p, b):
            return mdl.model_forward(p, cfg, b, deterministic=True).logits

        return np.asarray(fwd(p, b))

    flat = run(mesh_lib.make_mesh(data=4, model=2))
    multi = run(mesh_lib.make_mesh(data=2, model=2, dcn_data=2))
    np.testing.assert_array_equal(flat, multi)

    # data=-1 infers per-slice shards from the remaining device count
    inferred = mesh_lib.make_mesh(data=-1, model=2, dcn_data=2)
    assert dict(zip(inferred.axis_names, inferred.devices.shape)) == {
        "data": 4, "model": 2}


# ---------------------------------------------------------------------------
# pipeline parallelism (parallel/pipeline.py)
# ---------------------------------------------------------------------------

from multilingual_multimodal_speech_emotion_recognition_tpu.parallel.pipeline import (  # noqa: E402
    encoder_stack_pipeline)


@pytest.mark.parametrize("stable_ln", [False, True])
@pytest.mark.parametrize("microbatches", [2, 4])
def test_pipeline_stack_matches_dense(stable_ln, microbatches):
    """GPipe microbatch pipelining over 4 stages == the dense stack,
    including padded (masked) frames and both norm variants."""
    cfg = _tiny_cfg(stable_ln, layers=4)  # 4 layers / 4 stages
    params = w2v.init_wav2vec2(jax.random.key(1), cfg)
    stacked = params["layers"]

    B, S, E = 8, 24, cfg.hidden_size
    h = jnp.asarray(RNG.standard_normal((B, S, E)).astype(np.float32))
    lengths = [S, S - 7, S // 2, 3, S - 1, S - 11, 9, 5]
    frame_mask = jnp.asarray(
        (np.arange(S)[None, :] < np.asarray(lengths)[:, None])
        .astype(np.float32))

    mesh = mesh_lib.make_mesh(data=2, model=4)
    got = encoder_stack_pipeline(stacked, cfg, h, frame_mask, mesh,
                                 num_microbatches=microbatches)
    want = _dense(stacked, cfg, h, frame_mask)
    valid = np.asarray(frame_mask).astype(bool)
    np.testing.assert_allclose(np.asarray(got)[valid], np.asarray(want)[valid],
                               rtol=2e-4, atol=2e-5)


def test_pipeline_stack_wavlm_and_single_stage():
    """WavLM gated relpos through the pipeline; and the P=1 degenerate
    pipeline (pure microbatching) must also be exact."""
    base = _tiny_cfg(stable_ln=True, layers=4)
    cfg = w2v.Wav2Vec2Config(**{
        **base.__dict__, "gated_relpos_bias": True,
        "num_buckets": 16, "max_bucket_distance": 20})
    params = w2v.init_wav2vec2(jax.random.key(4), cfg)
    params["rel_attn_embed"] = jax.random.normal(
        jax.random.key(5), params["rel_attn_embed"].shape) * 0.1

    B, S = 8, 20
    h = jnp.asarray(RNG.standard_normal((B, S, cfg.hidden_size))
                    .astype(np.float32))
    lengths = [S, S - 5, 7, 2, S, S - 9, 11, 6]
    frame_mask = jnp.asarray(
        (np.arange(S)[None, :] < np.asarray(lengths)[:, None])
        .astype(np.float32))
    want = _dense(params["layers"], cfg, h, frame_mask, params)
    valid = np.asarray(frame_mask).astype(bool)

    got = encoder_stack_pipeline(
        params["layers"], cfg, h, frame_mask,
        mesh_lib.make_mesh(data=2, model=4), num_microbatches=4,
        rel_attn_embed=params["rel_attn_embed"])
    np.testing.assert_allclose(np.asarray(got)[valid], np.asarray(want)[valid],
                               rtol=2e-4, atol=2e-5)

    got1 = encoder_stack_pipeline(
        params["layers"], cfg, h, frame_mask,
        mesh_lib.make_mesh(data=8, model=1), num_microbatches=2,
        rel_attn_embed=params["rel_attn_embed"], batch_axis=None)
    np.testing.assert_allclose(np.asarray(got1)[valid],
                               np.asarray(want)[valid],
                               rtol=2e-4, atol=2e-5)

    with pytest.raises(AssertionError):
        encoder_stack_pipeline(params["layers"], cfg, h, frame_mask,
                               mesh_lib.make_mesh(data=2, model=4),
                               num_microbatches=2)


def test_pipeline_stack_is_differentiable():
    """Grads through the pipelined stack (scan + ppermute + masked psum)
    match the dense stack's — it can sit inside a training step."""
    cfg = _tiny_cfg(stable_ln=False, layers=2)
    params = w2v.init_wav2vec2(jax.random.key(6), cfg)
    stacked = params["layers"]

    B, S, E = 8, 12, cfg.hidden_size
    h = jnp.asarray(RNG.standard_normal((B, S, E)).astype(np.float32))
    frame_mask = jnp.ones((B, S), jnp.float32)
    mesh = mesh_lib.make_mesh(data=4, model=2)

    def loss_pipe(p, x):
        out = encoder_stack_pipeline(p, cfg, x, frame_mask, mesh,
                                     num_microbatches=2)
        return (out ** 2).sum()

    def loss_dense(p, x):
        return (_dense(p, cfg, x, frame_mask) ** 2).sum()

    # jit is required: eager shard_map can't evaluate the rematerialized
    # (closed_call) stage in reverse mode — and every framework caller is
    # jitted anyway
    gp_p, gp_x = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(stacked, h)
    gd_p, gd_x = jax.jit(jax.grad(loss_dense, argnums=(0, 1)))(stacked, h)
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gd_x),
                               rtol=5e-4, atol=5e-5)
    for (kp, a), (_, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(gp_p)[0],
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_flatten_with_path(gd_p)[0],
                   key=lambda t: str(t[0]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=str(kp))


# ---------------------------------------------------------------------------
# FSDP / ZeRO parameter + optimizer-state sharding (mesh.py:param_shardings)
# ---------------------------------------------------------------------------


def test_fsdp_sharding_rules():
    """Large leaves shard their largest free dim over 'data'; small leaves
    replicate; leaves already model-sharded keep the model dim and gain a
    'data' dim elsewhere (never the same dim twice)."""
    from jax.sharding import PartitionSpec as P

    mesh = mesh_lib.make_mesh(data=4, model=2)
    params = {
        "encoder": {"ffn_in": {"kernel": jnp.zeros((256, 512)),
                               "bias": jnp.zeros((512,))},
                    "ffn_out": {"kernel": jnp.zeros((512, 256))},
                    "norm": {"scale": jnp.zeros((256,))}},
        "small": {"kernel": jnp.zeros((4, 8))},
        "odd": {"kernel": jnp.zeros((258, 514))},  # nothing divisible by 4
    }
    sh = mesh_lib.param_shardings(params, mesh, fsdp=True, fsdp_min_size=64)
    # ffn_in is column-parallel on model; fsdp adds data on the other dim
    assert sh["encoder"]["ffn_in"]["kernel"].spec == P("data", "model")
    # ffn_out is row-parallel (model on dim 0); data takes dim 1
    assert sh["encoder"]["ffn_out"]["kernel"].spec == P("model", "data")
    # plain large vectors shard over data
    assert sh["encoder"]["ffn_in"]["bias"].spec == P("data")
    assert sh["encoder"]["norm"]["scale"].spec == P("data")
    # below min_size: replicated
    assert sh["small"]["kernel"].spec == P()
    # no divisible dim: stays on its model-rule spec (here replicated)
    assert sh["odd"]["kernel"].spec == P()

    # fsdp off reproduces the old behavior
    sh0 = mesh_lib.param_shardings(params, mesh)
    assert sh0["encoder"]["ffn_in"]["bias"].spec == P()


def test_fsdp_train_step_matches_replicated():
    """One full train step with ZeRO-sharded params + opt state must produce
    the same loss and (numerically) the same updated params as the
    replicated layout — FSDP is a layout change, not a math change."""
    from multilingual_multimodal_speech_emotion_recognition_tpu.config import TrainConfig
    from multilingual_multimodal_speech_emotion_recognition_tpu.train import (
        optimizer as opt_lib, train_step as ts)
    import multilingual_multimodal_speech_emotion_recognition_tpu.models.model as mdl
    from test_model import tiny_batch, tiny_config

    cfg = tiny_config()
    tcfg = TrainConfig(augment=False, freeze_backbones=False)
    params = mdl.init_model(jax.random.key(0), cfg)
    batch = dict(tiny_batch(B=8),
                 labels=jnp.asarray(np.arange(8) % cfg.num_labels))
    mesh = mesh_lib.make_mesh(data=4, model=2)
    key = jax.random.key(1)

    def run(fsdp):
        p = mesh_lib.shard_params(params, mesh, fsdp=fsdp, fsdp_min_size=1)
        tx = opt_lib.make_train_optimizer(p, lr=1e-3, total_steps=10)
        step = ts.make_train_step(cfg, tcfg, tx, donate=False)
        b = mesh_lib.shard_batch(batch, mesh)
        new_p, opt_state, metrics = step(p, tx.init(p), b, key)
        return new_p, float(metrics.loss), opt_state

    p_rep, loss_rep, _ = run(fsdp=False)
    p_fsdp, loss_fsdp, opt_fsdp = run(fsdp=True)

    np.testing.assert_allclose(loss_fsdp, loss_rep, rtol=1e-5)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(p_fsdp)[0],
            jax.tree_util.tree_flatten_with_path(p_rep)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=str(kp))

    # the optimizer state actually lives sharded: at least one moment leaf
    # must carry a 'data'-sharded spec (ZeRO, not just param sharding)
    specs = [getattr(l.sharding, "spec", None)
             for l in jax.tree.leaves(opt_fsdp)
             if hasattr(l, "sharding")]
    assert any(s is not None and "data" in str(s) for s in specs)

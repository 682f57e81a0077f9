"""Parity of the JAX Wav2Vec2 / XLM-R encoders against HF torch models.

Uses small randomly-initialized HF models built from configs (no network),
converted via hf_convert, and checks that our *batched masked* forward
matches HF's *per-sample unbatched* forward — the semantics the reference
gets from its per-clip Python loop (audio_encoder.py:65-145).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import multilingual_multimodal_speech_emotion_recognition_tpu.models.wav2vec2 as w2v
import multilingual_multimodal_speech_emotion_recognition_tpu.models.xlmr as xlmr
import multilingual_multimodal_speech_emotion_recognition_tpu.models.hf_convert as conv

RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def hf_w2v2():
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2Model
    torch.manual_seed(0)
    cfg = Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16, 16), conv_stride=(5, 2, 2),
        conv_kernel=(10, 3, 3), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, do_stable_layer_norm=False,
        feat_extract_norm="group", apply_spec_augment=False, layerdrop=0.0)
    m = Wav2Vec2Model(cfg).eval()
    return m, cfg


@pytest.fixture(scope="module")
def hf_xlmr():
    import torch
    from transformers import XLMRobertaConfig, XLMRobertaModel
    torch.manual_seed(1)
    cfg = XLMRobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        layer_norm_eps=1e-5)
    m = XLMRobertaModel(cfg, add_pooling_layer=False).eval()
    return m, cfg


def test_wav2vec2_batched_matches_hf_per_sample(hf_w2v2):
    import torch
    m, hcfg = hf_w2v2
    cfg = w2v.Wav2Vec2Config(
        conv_dim=tuple(hcfg.conv_dim), conv_stride=tuple(hcfg.conv_stride),
        conv_kernel=tuple(hcfg.conv_kernel), hidden_size=hcfg.hidden_size,
        num_hidden_layers=hcfg.num_hidden_layers,
        num_attention_heads=hcfg.num_attention_heads,
        intermediate_size=hcfg.intermediate_size,
        num_conv_pos_embeddings=hcfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hcfg.num_conv_pos_embedding_groups,
        apply_spec_augment=False)
    params = conv.wav2vec2_from_hf(m.state_dict(),
                                   num_layers=hcfg.num_hidden_layers,
                                   num_convs=len(hcfg.conv_dim))

    lengths = [400, 333, 260]
    T = max(lengths)
    wave = np.zeros((3, T), np.float32)
    mask = np.zeros((3, T), np.float32)
    raw = []
    for i, L in enumerate(lengths):
        x = RNG.standard_normal(L).astype(np.float32)
        raw.append(x)
        # HF feature-extractor normalization per sample
        xn = (x - x.mean()) / np.sqrt(x.var() + 1e-7)
        wave[i, :L] = xn
        mask[i, :L] = 1

    got, frame_mask = w2v.wav2vec2_encode(params, cfg, jnp.asarray(wave),
                                          jnp.asarray(mask), normalize=False)
    got = np.asarray(got)
    fm = np.asarray(frame_mask)

    for i, x in enumerate(raw):
        xn = (x - x.mean()) / np.sqrt(x.var() + 1e-7)
        with torch.no_grad():
            want = m(torch.from_numpy(xn[None])).last_hidden_state[0].numpy()
        n_valid = int(fm[i].sum())
        assert n_valid == want.shape[0]
        np.testing.assert_allclose(got[i, :n_valid], want, rtol=5e-4, atol=5e-5)


def test_wav2vec2_stable_layer_norm_matches_hf_per_sample():
    """Large-model variant: do_stable_layer_norm=True (pre-LN encoder with
    final LN after the stack) + feat_extract_norm="layer" (per-conv channel
    LN, conv bias) — the wav2vec2-large / HuBERT-Large configuration
    (BASELINE.md config matrix; HF Wav2Vec2EncoderStableLayerNorm)."""
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2Model
    torch.manual_seed(7)
    hcfg = Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16, 16), conv_stride=(5, 2, 2),
        conv_kernel=(10, 3, 3), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, do_stable_layer_norm=True,
        feat_extract_norm="layer", conv_bias=True,
        apply_spec_augment=False, layerdrop=0.0)
    m = Wav2Vec2Model(hcfg).eval()

    cfg = w2v.Wav2Vec2Config(
        conv_dim=tuple(hcfg.conv_dim), conv_stride=tuple(hcfg.conv_stride),
        conv_kernel=tuple(hcfg.conv_kernel), conv_bias=True,
        hidden_size=hcfg.hidden_size,
        num_hidden_layers=hcfg.num_hidden_layers,
        num_attention_heads=hcfg.num_attention_heads,
        intermediate_size=hcfg.intermediate_size,
        num_conv_pos_embeddings=hcfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hcfg.num_conv_pos_embedding_groups,
        do_stable_layer_norm=True, feat_extract_norm="layer",
        apply_spec_augment=False)
    params = conv.wav2vec2_from_hf(m.state_dict())
    # the converter must have detected the layer-norm-conv layout
    assert "ln" in params["convs"][1]
    assert "group_norm" not in params

    lengths = [400, 333, 260]
    T = max(lengths)
    wave = np.zeros((3, T), np.float32)
    mask = np.zeros((3, T), np.float32)
    raw = []
    for i, L in enumerate(lengths):
        x = RNG.standard_normal(L).astype(np.float32)
        raw.append(x)
        xn = (x - x.mean()) / np.sqrt(x.var() + 1e-7)
        wave[i, :L] = xn
        mask[i, :L] = 1

    got, frame_mask = w2v.wav2vec2_encode(params, cfg, jnp.asarray(wave),
                                          jnp.asarray(mask), normalize=False)
    got = np.asarray(got)
    fm = np.asarray(frame_mask)
    for i, x in enumerate(raw):
        xn = (x - x.mean()) / np.sqrt(x.var() + 1e-7)
        with torch.no_grad():
            want = m(torch.from_numpy(xn[None])).last_hidden_state[0].numpy()
        n_valid = int(fm[i].sum())
        assert n_valid == want.shape[0]
        np.testing.assert_allclose(got[i, :n_valid], want, rtol=5e-4, atol=5e-5)


def test_hubert_converts_and_matches_hf():
    """HuBERT-Large uses the identical key layout (per-conv LN, conv bias,
    stable LN encoder) — hf_convert.wav2vec2_from_hf must convert a
    HubertModel state dict directly (BASELINE.md backbone matrix)."""
    import torch
    from transformers import HubertConfig, HubertModel
    torch.manual_seed(11)
    hcfg = HubertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16, 16), conv_stride=(5, 2, 2),
        conv_kernel=(10, 3, 3), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, do_stable_layer_norm=True,
        feat_extract_norm="layer", conv_bias=True,
        apply_spec_augment=False, layerdrop=0.0)
    m = HubertModel(hcfg).eval()
    cfg = w2v.Wav2Vec2Config(
        conv_dim=(16, 16, 16), conv_stride=(5, 2, 2), conv_kernel=(10, 3, 3),
        conv_bias=True, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True, feat_extract_norm="layer",
        apply_spec_augment=False)
    params = conv.wav2vec2_from_hf(m.state_dict())

    L = 400
    x = RNG.standard_normal(L).astype(np.float32)
    got, fm = w2v.wav2vec2_encode(params, cfg, jnp.asarray(x[None]),
                                  jnp.ones((1, L)), normalize=False)
    with torch.no_grad():
        want = m(torch.from_numpy(x[None])).last_hidden_state[0].numpy()
    n_valid = int(np.asarray(fm)[0].sum())
    assert n_valid == want.shape[0]
    np.testing.assert_allclose(np.asarray(got)[0, :n_valid], want,
                               rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("stable_ln", [False, True])
def test_wavlm_converts_and_matches_hf(stable_ln):
    """WavLM (BASELINE.md backbone matrix): gated bucketed relative position
    bias (HF WavLMAttention, modeling_wavlm.py:108-251) on top of the
    wav2vec2 skeleton. Covers both encoder norm variants — the gate input is
    the raw block input post-LN in the stable variant, raw otherwise."""
    import torch
    from transformers import WavLMConfig, WavLMModel
    torch.manual_seed(13 + stable_ln)
    hcfg = WavLMConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16, 16), conv_stride=(5, 2, 2),
        conv_kernel=(10, 3, 3), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=stable_ln,
        feat_extract_norm="layer" if stable_ln else "group",
        conv_bias=False, num_buckets=16, max_bucket_distance=40,
        apply_spec_augment=False, layerdrop=0.0)
    m = WavLMModel(hcfg).eval()
    cfg = w2v.Wav2Vec2Config(
        conv_dim=(16, 16, 16), conv_stride=(5, 2, 2), conv_kernel=(10, 3, 3),
        conv_bias=False, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=stable_ln,
        feat_extract_norm="layer" if stable_ln else "group",
        gated_relpos_bias=True, num_buckets=16, max_bucket_distance=40,
        apply_spec_augment=False)
    params = conv.wav2vec2_from_hf(m.state_dict())
    assert "rel_attn_embed" in params
    assert params["layers"]["gru_const"].shape == (3, 4)

    lengths = [400, 333, 260]
    T = max(lengths)
    wave = np.zeros((3, T), np.float32)
    mask = np.zeros((3, T), np.float32)
    raw = []
    for i, L in enumerate(lengths):
        x = RNG.standard_normal(L).astype(np.float32)
        raw.append(x)
        xn = (x - x.mean()) / np.sqrt(x.var() + 1e-7)
        wave[i, :L] = xn
        mask[i, :L] = 1

    got, frame_mask = w2v.wav2vec2_encode(params, cfg, jnp.asarray(wave),
                                          jnp.asarray(mask), normalize=False)
    got = np.asarray(got)
    fm = np.asarray(frame_mask)
    for i, x in enumerate(raw):
        xn = (x - x.mean()) / np.sqrt(x.var() + 1e-7)
        with torch.no_grad():
            want = m(torch.from_numpy(xn[None])).last_hidden_state[0].numpy()
        n_valid = int(fm[i].sum())
        assert n_valid == want.shape[0]
        np.testing.assert_allclose(got[i, :n_valid], want, rtol=5e-4, atol=5e-5)


def test_wavlm_relative_position_bucket_matches_hf():
    """The bucketization itself against HF's torch implementation across the
    full bucket range (small, exact, log-spaced, clamped)."""
    import torch
    from transformers.models.wavlm.modeling_wavlm import WavLMAttention
    attn = WavLMAttention(embed_dim=8, num_heads=2, num_buckets=32,
                          max_distance=128, has_relative_position_bias=True)
    rel = np.arange(-300, 301)
    want = attn._relative_positions_bucket(torch.from_numpy(rel)).numpy()
    cfg = w2v.Wav2Vec2Config(gated_relpos_bias=True, num_buckets=32,
                             max_bucket_distance=128)
    got = np.asarray(w2v._relative_positions_bucket(
        jnp.asarray(rel), cfg.num_buckets, cfg.max_bucket_distance))
    np.testing.assert_array_equal(got, want)


def test_wav2vec2_masked_normalize_matches_hf_fe(hf_w2v2):
    # our normalize=True path equals HF's zero_mean_unit_var_norm per sample
    L, T = 300, 400
    x = RNG.standard_normal(L).astype(np.float32)
    wave = np.zeros((1, T), np.float32)
    wave[0, :L] = x
    mask = np.zeros((1, T), np.float32)
    mask[0, :L] = 1
    got = np.asarray(w2v.normalize_waveform(jnp.asarray(wave), jnp.asarray(mask)))
    want = (x - x.mean()) / np.sqrt(x.var() + 1e-7)
    np.testing.assert_allclose(got[0, :L], want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got[0, L:], 0.0)


def test_wav2vec2_output_lengths():
    cfg = w2v.Wav2Vec2Config()
    lengths = jnp.asarray([16000, 8000, 480000])
    out = cfg.feat_extract_output_lengths(lengths)
    # HF formula: floor((L - k)/s) + 1 cascaded
    def ref(L):
        for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
            L = (L - k) // s + 1
        return L
    np.testing.assert_array_equal(np.asarray(out), [ref(16000), ref(8000), ref(480000)])


def test_xlmr_batched_matches_hf(hf_xlmr):
    import torch
    m, hcfg = hf_xlmr
    cfg = xlmr.XLMRConfig(
        vocab_size=hcfg.vocab_size, hidden_size=hcfg.hidden_size,
        num_hidden_layers=hcfg.num_hidden_layers,
        num_attention_heads=hcfg.num_attention_heads,
        intermediate_size=hcfg.intermediate_size,
        max_position_embeddings=hcfg.max_position_embeddings,
        type_vocab_size=hcfg.type_vocab_size, pad_token_id=hcfg.pad_token_id,
        layer_norm_eps=hcfg.layer_norm_eps)
    params = conv.xlmr_from_hf(m.state_dict(), num_layers=hcfg.num_hidden_layers)

    B, S = 3, 12
    ids = RNG.integers(2, 120, (B, S)).astype(np.int32)
    am = np.ones((B, S), np.int64)
    ids[1, 8:] = 1  # pad
    am[1, 8:] = 0
    ids[2, 5:] = 1
    am[2, 5:] = 0

    got = np.asarray(xlmr.xlmr_encode(params, cfg, jnp.asarray(ids),
                                      jnp.asarray(am.astype(np.float32))))
    with torch.no_grad():
        want = m(input_ids=torch.from_numpy(ids.astype(np.int64)),
                 attention_mask=torch.from_numpy(am)).last_hidden_state.numpy()
    valid = am.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], rtol=5e-4, atol=5e-5)


def test_xlmr_position_ids():
    ids = jnp.asarray([[0, 5, 6, 2, 1, 1]])
    pos = xlmr.position_ids_from_input_ids(ids, 1)
    np.testing.assert_array_equal(np.asarray(pos), [[2, 3, 4, 5, 1, 1]])


def test_wav2vec2_spec_augment_masks_frames(hf_w2v2):
    m, hcfg = hf_w2v2
    cfg = w2v.Wav2Vec2Config(
        conv_dim=tuple(hcfg.conv_dim), conv_stride=tuple(hcfg.conv_stride),
        conv_kernel=tuple(hcfg.conv_kernel), hidden_size=hcfg.hidden_size,
        num_hidden_layers=hcfg.num_hidden_layers,
        num_attention_heads=hcfg.num_attention_heads,
        intermediate_size=hcfg.intermediate_size,
        num_conv_pos_embeddings=hcfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hcfg.num_conv_pos_embedding_groups,
        apply_spec_augment=True, mask_time_prob=0.5, mask_time_length=2)
    params = conv.wav2vec2_from_hf(m.state_dict(),
                                   num_layers=hcfg.num_hidden_layers,
                                   num_convs=len(hcfg.conv_dim))
    wave = jnp.asarray(RNG.standard_normal((2, 400)).astype(np.float32))
    mask = jnp.ones((2, 400))
    det, _ = w2v.wav2vec2_encode(params, cfg, wave, mask)
    aug, _ = w2v.wav2vec2_encode(params, cfg, wave, mask, deterministic=False,
                                 dropout_key=jax.random.key(0), spec_augment=True)
    assert not np.allclose(np.asarray(det), np.asarray(aug))

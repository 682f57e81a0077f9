"""Data layer tests: wav IO, manifests, tokenizer, bucketed pipeline,
device-side DSP (resample/speed/noise/TTA)."""

import json
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multilingual_multimodal_speech_emotion_recognition_tpu.config import DataConfig
import multilingual_multimodal_speech_emotion_recognition_tpu.data.audio_io as aio
import multilingual_multimodal_speech_emotion_recognition_tpu.data.manifest as man
import multilingual_multimodal_speech_emotion_recognition_tpu.data.pipeline as pipe
import multilingual_multimodal_speech_emotion_recognition_tpu.data.tokenizer as tok
import multilingual_multimodal_speech_emotion_recognition_tpu.ops.audio_dsp as dsp

RNG = np.random.default_rng(11)


@pytest.fixture()
def wav_dir(tmp_path):
    root = tmp_path / "datasets" / "crema"
    root.mkdir(parents=True)
    sr = 16000
    lengths = [8000, 16000, 24000, 40000, 70000]
    emotions = ["ANG", "HAP", "SAD", "NEU", "DIS"]
    items = []
    for i, (L, emo) in enumerate(zip(lengths, emotions)):
        t = np.arange(L) / sr
        x = 0.4 * np.sin(2 * np.pi * (200 + 50 * i) * t).astype(np.float32)
        name = f"10{i:02d}_IEO_{emo}_XX.wav"
        aio.write_wav(root / name, x, sr)
        items.append({"audio": f"crema/{name}", "text": f"utterance {i}",
                      "label": man.crema_label(name), "dataset": "crema"})
    mpath = tmp_path / "train.jsonl"
    man.write_manifest(mpath, items)
    return tmp_path, mpath, items


def test_wav_roundtrip(tmp_path):
    x = np.clip(RNG.standard_normal(5000) * 0.3, -1, 1).astype(np.float32)
    aio.write_wav(tmp_path / "a.wav", x, 16000)
    y, sr = aio.read_wav(tmp_path / "a.wav")
    assert sr == 16000
    np.testing.assert_allclose(y[0], x, atol=1.5 / 32768)


def test_load_audio_semantics(wav_dir, tmp_path):
    root, _, items = wav_dir
    # trims to max_length and pads to min_length
    w = aio.load_audio(items[0]["audio"], dataset_root=str(root / "datasets"),
                       max_length=0.25)
    assert w.shape[0] == 8000  # min_length 0.5s floor beats 0.25 trim? no:
    # trim to 0.25s=4000 then pad to 0.5s=8000
    assert np.all(w[4000:] == 0)
    # missing file -> 1 s of zeros
    z = aio.load_audio("does/not/exist.wav", dataset_root=str(root / "datasets"))
    assert z.shape == (16000,) and np.all(z == 0)


def test_crema_label_maps():
    assert man.crema_label("1001_DFA_ANG_HI.wav") == 0
    assert man.crema_label("1001_DFA_FEA_HI.wav") == 5
    assert man.crema_label("1001_DFA_FEA_HI.wav", num_classes=4) == 0
    assert man.ravdess_label("03-01-05-01-01-01-07.wav") == 0
    assert man.ravdess_label("03-01-03-01-01-01-07.wav") == 1
    assert man.tess_label("OAF_back_angry.wav") == 0


def test_reference_manifests_parse():
    # vendored copy of the reference's shipped manifest (fixtures/ mirrors
    # the three crema_{train_70,val_20,test_10}.jsonl files at the
    # reference root) — no /root/reference runtime dependency
    import pathlib
    root = pathlib.Path(__file__).resolve().parents[1]
    items = man.read_manifest(str(root / "fixtures" / "crema_val_20.jsonl"))
    assert len(items) == 1488
    dist = man.class_distribution(items)
    assert set(dist) <= set(range(6))
    # labels in the shipped fixture match our 6-class filename parser
    for it in items[:50]:
        assert man.crema_label(it["audio"]) == it["label"]


def test_stratified_and_speaker_disjoint_splits():
    items = [{"audio": f"a{i}.wav", "label": i % 4, "dataset": "d",
              "speaker": f"s{i % 7}"} for i in range(140)]
    tr, va, te = man.stratified_split(items)
    assert len(tr) + len(va) + len(te) == 140
    assert abs(len(tr) - 98) <= 4
    tr2, va2, te2 = man.speaker_disjoint_split(items)
    spk = lambda part: {it["speaker"] for it in part}
    assert not (spk(tr2) & spk(va2)) and not (spk(tr2) & spk(te2))


def test_hash_tokenizer_deterministic():
    t = tok.HashTokenizer(vocab_size=1000)
    ids1, m1 = t.encode_batch(["hello world", ""], 8)
    ids2, _ = t.encode_batch(["hello world", ""], 8)
    np.testing.assert_array_equal(ids1, ids2)
    assert ids1[0, 0] == t.BOS and ids1[0, 3] == t.EOS
    assert m1[0].sum() == 4 and m1[1].sum() == 2
    assert ids1.max() < 1000


def test_bucketed_loader_shapes(wav_dir):
    root, mpath, items = wav_dir
    cfg = DataConfig(audio_buckets=(1.0, 2.0, 30.0),
                     dataset_root=str(root / "datasets"), max_text_tokens=16)
    ds = pipe.SERDataset(str(mpath), cfg)
    loader = pipe.BucketedLoader(ds, batch_size=2, shuffle=True, seed=1,
                                 tokenizer=tok.HashTokenizer(1000))
    batches = list(loader.epoch(0))
    assert len(batches) == loader.batches_per_epoch()
    seen = 0
    allowed_T = {16000, 32000, 480000}
    for b in batches:
        assert b["audio"].shape[0] == 2 and b["audio"].shape[1] in allowed_T
        assert b["audio_mask"].shape == b["audio"].shape
        assert b["text_ids"].shape == (2, 16)
        # masked samples are zeroed; valid region nonzero for real rows
        assert np.all(b["audio"] * (1 - b["audio_mask"]) == 0)
        seen += int(b["example_mask"].sum())
        # padded rows keep at least one valid frame (no all-masked softmax)
        assert b["audio_mask"].sum(axis=1).min() >= 1
    assert seen == len(items)


def test_gates_see_text_false_emits_no_text_lid_constants(wav_dir):
    """DataConfig.gates_see_text=False replicates the reference's plain
    eval loop (eval.py:192 passes no texts to the encoder): every row's
    LID scalars are the no-text fallback (1.0, 0.0)
    (quality_gates.py:509-512) regardless of manifest text."""
    root, mpath, items = wav_dir
    cfg = DataConfig(audio_buckets=(1.0, 2.0, 30.0),
                     dataset_root=str(root / "datasets"), max_text_tokens=16,
                     gates_see_text=False)
    ds = pipe.SERDataset(str(mpath), cfg)
    loader = pipe.BucketedLoader(ds, batch_size=2, shuffle=False,
                                 tokenizer=tok.HashTokenizer(1000))
    for b in loader.epoch(0):
        np.testing.assert_array_equal(b["lid_entropy"],
                                      np.ones_like(b["lid_entropy"]))
        np.testing.assert_array_equal(b["lid_conf"],
                                      np.zeros_like(b["lid_conf"]))
        # text still tokenizes normally (only the GATES lose the text)
        assert b["text_ids"].shape[1] == 16


def test_sinc_resample_sine_preserves_frequency():
    sr, f0 = 16000, 440.0
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)[None]
    y = np.asarray(dsp.sinc_resample(jnp.asarray(x), 16000, 8000))[0]
    assert y.shape[0] == 8000
    # dominant FFT bin should stay at 440 Hz
    spec = np.abs(np.fft.rfft(y[200:-200] * np.hanning(y.shape[0] - 400)))
    freq = np.fft.rfftfreq(y.shape[0] - 400, 1 / 8000)
    assert abs(freq[np.argmax(spec)] - f0) < 2.0
    # round trip preserves the signal closely
    z = np.asarray(dsp.sinc_resample(jnp.asarray(y[None]), 8000, 16000))[0]
    err = np.abs(z[500:15000] - x[0, 500:15000]).max()
    assert err < 5e-3


def test_resampled_length_formula():
    assert dsp.resampled_length(16000, 16000, 8000) == 8000
    assert dsp.resampled_length(16001, 16000, 8000) == math.ceil(16001 / 2)


def test_sinc_resample_matches_torchaudio_oracle():
    """ops/audio_dsp.sinc_resample vs an independent direct-summation
    re-derivation of torchaudio.functional.resample's windowed-sinc
    polyphase kernel (tests/refenv/resample_oracle.py) — the numeric
    parity check SURVEY.md hard-part #3 asks for, across the speed-perturb
    rate set (preprocess.py:50-62) and ragged lengths."""
    from refenv.resample_oracle import resample_oracle
    rng = np.random.default_rng(5)
    sr = 16000
    for factor in (0.9, 0.95, 1.05, 1.1):
        new_sr = int(sr * factor)
        for T in (1601, 4096, 7777):
            x = rng.standard_normal((2, T)).astype(np.float32) * 0.5
            got = np.asarray(dsp.sinc_resample(jnp.asarray(x), sr, new_sr))
            want = resample_oracle(x, sr, new_sr)
            assert got.shape == want.shape, (factor, T)
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5,
                                       err_msg=f"factor={factor} T={T}")


def test_speed_perturb_matches_double_resample_oracle():
    """The full speed-perturb estimator (double resample, preprocess.py:
    50-62) against the oracle's double resample — covers the composed
    kernel the reference's augmentation and eval-time TTA actually run."""
    from refenv.resample_oracle import speed_perturb_oracle
    rng = np.random.default_rng(9)
    sr, T = 16000, 6400
    x = rng.standard_normal((1, T)).astype(np.float32) * 0.4
    for factor in (0.9, 0.95, 1.05, 1.1):
        got = np.asarray(dsp.speed_perturb(jnp.asarray(x), factor, sr))
        want = speed_perturb_oracle(x, factor, sr)
        L = min(got.shape[-1], want.shape[-1])
        np.testing.assert_allclose(got[..., :L], want[..., :L],
                                   rtol=3e-4, atol=3e-5,
                                   err_msg=f"factor={factor}")
        # speed_perturb pads/trims back to T; beyond the oracle's length
        # the tail must be exact zeros
        if got.shape[-1] > L:
            assert np.all(got[..., L:] == 0.0)


def test_add_noise_snr_hits_target():
    T = 16000
    x = (0.3 * np.sin(np.arange(T) * 0.05)).astype(np.float32)[None]
    mask = jnp.ones((1, T))
    y = np.asarray(dsp.add_noise_snr(jax.random.key(0), jnp.asarray(x), mask, 10.0))
    noise = y - x
    snr = 10 * np.log10((x ** 2).mean() / (noise ** 2).mean())
    assert abs(snr - 10.0) < 1.0
    assert np.abs(y).max() <= 1.0


def test_augment_batch_shapes_and_determinism():
    B, T = 4, 8000
    wave = jnp.asarray(RNG.standard_normal((B, T)).astype(np.float32) * 0.1)
    mask = jnp.ones((B, T)).at[1, 6000:].set(0)
    f = jax.jit(lambda k, w, m: dsp.augment_batch(k, w, m))
    w1, m1 = f(jax.random.key(5), wave, mask)
    w2, m2 = f(jax.random.key(5), wave, mask)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    assert w1.shape == (B, T) and m1.shape == (B, T)
    assert not np.allclose(np.asarray(w1), np.asarray(wave))


def test_augment_batch_per_batch_speed():
    """speed_per_batch=True (single lax.switch branch, 3x cheaper at the
    30 s bucket) keeps shapes/masks valid and still perturbs."""
    import jax
    import jax.numpy as jnp
    from multilingual_multimodal_speech_emotion_recognition_tpu.ops import audio_dsp

    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((4, 8000)).astype(np.float32) * 0.1)
    mask = jnp.ones((4, 8000), jnp.float32)
    w2, m2 = jax.jit(lambda k, w, m: audio_dsp.augment_batch(
        k, w, m, speed_per_batch=True, speed_prob=1.0, noise_prob=0.0))(
        jax.random.key(3), wave, mask)
    assert w2.shape == wave.shape and m2.shape == mask.shape
    assert not np.allclose(np.asarray(w2), np.asarray(wave))
    # masked-out tail stays zero
    assert float(np.abs(np.asarray(w2) * (1 - np.asarray(m2))).sum()) == 0.0


def test_tta_expand_views():
    B, T = 2, 8000
    wave = jnp.asarray(RNG.standard_normal((B, T)).astype(np.float32) * 0.1)
    mask = jnp.ones((B, T))
    w, m = dsp.tta_expand(jax.random.key(0), wave, mask, num_tta=5)
    assert w.shape == (5 * B, T) and m.shape == (5 * B, T)
    np.testing.assert_array_equal(np.asarray(w[:B]), np.asarray(wave))  # view 0 = orig
    assert not np.allclose(np.asarray(w[B:2 * B]), np.asarray(wave))    # speed 0.95


def test_duration_probe_matches_load_for_unprobeable_files(tmp_path):
    """A file the WAV-header probe can't read must be bucketed by its
    actual decoded length (== what load() returns), never by a guessed
    constant — a mis-probed bucket would silently truncate the clip."""
    from multilingual_multimodal_speech_emotion_recognition_tpu.config import DataConfig
    from multilingual_multimodal_speech_emotion_recognition_tpu.data import manifest as man
    from multilingual_multimodal_speech_emotion_recognition_tpu.data.pipeline import SERDataset

    ds_root = tmp_path / "ds"
    ds_root.mkdir()
    # not a RIFF container: both the header probe and the decoder fail,
    # so load() returns the 1 s zeros fallback
    (ds_root / "junk.flac").write_bytes(b"\x00\x01" * 4000)
    man.write_manifest(tmp_path / "m.jsonl",
                       [{"audio": "junk.flac", "text": "x", "label": 0,
                         "dataset": "d"}])
    ds = SERDataset(str(tmp_path / "m.jsonl"),
                    DataConfig(dataset_root=str(ds_root)))
    wav, _, _ = ds.load(0)
    assert ds.audio_length(0) == len(wav)


def test_loader_emits_asr_feats(tmp_path):
    """DataConfig.emit_asr_feats plumbs 8-dim ASR features into batches
    (text_encoder.py:39-48 integration path)."""
    import dataclasses
    import multilingual_multimodal_speech_emotion_recognition_tpu.data.audio_io as aio
    import multilingual_multimodal_speech_emotion_recognition_tpu.data.manifest as man
    from multilingual_multimodal_speech_emotion_recognition_tpu.config import DataConfig
    from multilingual_multimodal_speech_emotion_recognition_tpu.data.pipeline import (
        BucketedLoader, SERDataset)
    from multilingual_multimodal_speech_emotion_recognition_tpu.data.tokenizer import (
        HashTokenizer)

    wavdir = tmp_path / "ds" / "x"
    wavdir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    items = []
    for i in range(4):
        aio.write_wav(wavdir / f"{i}.wav",
                      0.1 * rng.standard_normal(8000).astype(np.float32), 16000)
        items.append({"audio": f"x/{i}.wav", "text": "three plain words",
                      "label": i % 2, "dataset": "x"})
    man.write_manifest(tmp_path / "m.jsonl", items)
    cfg = DataConfig(audio_buckets=(1.0,), max_text_tokens=8,
                     dataset_root=str(tmp_path / "ds"), emit_asr_feats=True)
    loader = BucketedLoader(SERDataset(str(tmp_path / "m.jsonl"), cfg),
                            batch_size=4, tokenizer=HashTokenizer(100),
                            shuffle=False)
    batch = next(iter(loader.epoch(0)))
    assert batch["asr_feats"].shape == (4, 8)
    # with text present: confidence 1, has-text flag 1, word count 3/50
    np.testing.assert_allclose(batch["asr_feats"][0, 0], 1.0)
    np.testing.assert_allclose(batch["asr_feats"][0, 7], 1.0)
    np.testing.assert_allclose(batch["asr_feats"][0, 6], 3 / 50, atol=1e-6)


def test_optimal_buckets_matches_bruteforce():
    """DP bucket choice is exactly optimal: compare against exhaustive
    search over all contiguous partitions on small random instances."""
    import itertools
    from multilingual_multimodal_speech_emotion_recognition_tpu.data import (
        bucketing)

    rng = np.random.default_rng(7)
    for trial in range(20):
        lengths = rng.integers(1, 40, size=rng.integers(3, 12)).tolist()
        k = int(rng.integers(1, 4))
        vals = sorted(set(lengths))
        if len(vals) <= k:
            caps = bucketing.optimal_buckets(lengths, k)
            assert caps == vals  # zero padding achievable
            continue

        def total_pad(caps):
            caps = sorted(caps)
            pad = 0
            for L in lengths:
                cap = next(c for c in caps if c >= L)
                pad += cap - L
            return pad

        # brute force: any subset of unique values containing the max
        best = min(total_pad(list(combo) + [vals[-1]])
                   for r in range(k) for combo in
                   itertools.combinations(vals[:-1], r))
        got = bucketing.optimal_buckets(lengths, k)
        assert got[-1] == vals[-1]  # never truncates the longest clip
        assert len(got) <= k
        assert total_pad(got) == best, (lengths, k, got)


def test_padded_fraction_and_report():
    from multilingual_multimodal_speech_emotion_recognition_tpu.data import (
        bucketing)

    # all clips exactly at caps -> zero padding
    assert bucketing.padded_fraction([10, 20, 20], [10, 20]) == 0.0
    # one cap of 20 for lengths 10,20 -> pad 10 of 40 processed
    np.testing.assert_allclose(
        bucketing.padded_fraction([10, 20], [20]), 0.25)
    # tuned caps never do worse than the default grid
    rng = np.random.default_rng(3)
    lengths = rng.integers(8000, 480000, 500)
    default = [int(s * 16000) for s in (2.0, 4.0, 8.0, 16.0, 30.0)]
    tuned = bucketing.optimal_buckets(lengths, 5)
    assert (bucketing.padded_fraction(lengths, tuned)
            <= bucketing.padded_fraction(lengths, default))
    report = bucketing.bucket_report(lengths, default, tuned)
    assert "->" in report


def test_autotune_audio_buckets_rounds_up():
    from multilingual_multimodal_speech_emotion_recognition_tpu.data import (
        bucketing)
    caps = bucketing.autotune_audio_buckets([16001, 16001, 64000], 2, 16000)
    assert caps == (1.01, 4.0)  # rounded UP to 10 ms, never truncating


def test_seconds_to_samples_roundtrip_every_centisecond():
    """The never-truncate guarantee crosses a seconds<->samples round-trip:
    autotune returns centisecond caps, the pipeline converts them back to
    samples. int() floors 37 of the first 6000 centisecond values at 16 kHz
    (e.g. int(8.04*16000)==128639); seconds_to_samples must be exact."""
    from multilingual_multimodal_speech_emotion_recognition_tpu.data import (
        bucketing)
    for cs in range(1, 6001):               # 0.01 s .. 60.00 s
        assert bucketing.seconds_to_samples(cs / 100, 16000) == cs * 160
    # the motivating case end-to-end: the longest clip defines a cap that
    # must hold exactly that many samples after the round-trip
    lengths = [32000, 64000, 128640]        # 8.04 s clip
    caps = bucketing.autotune_audio_buckets(lengths, 2, 16000)
    caps_samples = [bucketing.seconds_to_samples(c, 16000) for c in caps]
    assert max(caps_samples) >= 128640
    for n in lengths:
        assert any(n <= cs for cs in caps_samples)

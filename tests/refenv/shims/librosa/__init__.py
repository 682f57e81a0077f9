"""librosa shim: the exact subset the reference's quality gates / content
detector / ASR feature paths call (quality_gates.py:110-342,
asr_integration.py:117-446), re-implemented in numpy with librosa's
documented semantics so the reference entry scripts run in this
zero-egress environment (librosa is not installed).

Conventions implemented (classic librosa defaults, matching what
frontend/spectral.py targets):
  stft:   n_fft window of sp hann (periodic), center=True with REFLECT
          padding, frames = 1 + T // hop
  rms:    frame_length=2048, hop_length=512, center=True with ZERO padding
  spectral_centroid/rolloff/bandwidth: on |stft| magnitudes, n_fft=2048,
          hop=512; rolloff roll_percent=0.85; bandwidth p=2 over
          per-frame-normalized magnitudes
  frames_to_time / resample: ASR-path helpers (resample delegates to the
          torchaudio-derived windowed-sinc oracle)

mfcc is called by ContentTypeDetector.detect_content_type
(quality_gates.py:327) but its value is never read — implemented as a
real log-mel DCT anyway so the shim stays honest if that changes.
"""

from __future__ import annotations

import numpy as np

from . import feature  # noqa: F401  (librosa.feature.* call surface)

__version__ = "0.9.2-shim"


def _hann(n: int) -> np.ndarray:
    # scipy.signal.get_window('hann', n, fftbins=True): periodic hann
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


def _frame(x: np.ndarray, frame_length: int, hop: int) -> np.ndarray:
    n = 1 + (x.shape[-1] - frame_length) // hop
    idx = np.arange(frame_length)[None, :] + hop * np.arange(n)[:, None]
    return x[idx]


def stft(y: np.ndarray, n_fft: int = 2048, hop_length: int | None = None,
         win_length: int | None = None, center: bool = True,
         pad_mode: str = "reflect") -> np.ndarray:
    """[T] -> complex [n_fft//2 + 1, frames] (librosa axis order)."""
    y = np.asarray(y, np.float64)
    hop = hop_length if hop_length is not None else n_fft // 4
    if center:
        y = np.pad(y, (n_fft // 2, n_fft // 2), mode=pad_mode)
    frames = _frame(y, n_fft, hop) * _hann(n_fft)[None, :]
    return np.fft.rfft(frames, axis=-1).T


def frames_to_time(frames, sr: int = 22050, hop_length: int = 512,
                   n_fft=None) -> np.ndarray:
    return np.asarray(frames, np.float64) * hop_length / sr


def resample(y: np.ndarray, orig_sr: int, target_sr: int, **kw) -> np.ndarray:
    """ASR path only (asr_integration.py:117,349). librosa's default is a
    soxr resampler; the windowed-sinc oracle is the closest faithful
    stand-in available here (both are high-order lowpass interpolators)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    from resample_oracle import resample_oracle
    return resample_oracle(np.asarray(y, np.float64), int(orig_sr),
                           int(target_sr)).astype(np.float32)

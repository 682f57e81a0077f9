"""torchaudio shim: the subset the reference's data layer calls
(preprocess.py:15 `torchaudio.load`, :27,59-60
`torchaudio.functional.resample`). torchaudio is not installed here;
`load` decodes WAV with the stdlib (same int16 -> float scaling as
torchaudio's /32768) and `functional.resample` is the windowed-sinc
oracle (tests/refenv/resample_oracle.py) returned as a torch tensor.
"""

from __future__ import annotations

import sys
import wave as _wave
from pathlib import Path

import numpy as np
import torch

from . import functional  # noqa: F401


def load(path, **kw):
    """Returns (FloatTensor [channels, T] in [-1, 1], sample_rate)."""
    with _wave.open(str(path), "rb") as w:
        nch = w.getnchannels()
        width = w.getsampwidth()
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = (np.frombuffer(raw, dtype="<i4").astype(np.float32)
                / 2147483648.0)
    else:
        raise ValueError(f"shim torchaudio.load: sample width {width}")
    return torch.from_numpy(data.reshape(-1, nch).T.copy()), sr


def save(path, src, sample_rate, **kw):
    x = src.detach().cpu().numpy()
    if x.ndim == 2:
        x = x.T
    pcm = np.clip(x * 32768.0, -32768, 32767).astype("<i2")
    with _wave.open(str(path), "wb") as w:
        w.setnchannels(pcm.shape[1] if pcm.ndim == 2 else 1)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(pcm.tobytes())

"""torchaudio.functional shim: resample via the numpy windowed-sinc
oracle (tests/refenv/resample_oracle.py — sinc_interp_hann semantics,
lowpass_filter_width=6, rolloff=0.99, the torchaudio defaults the
reference relies on at preprocess.py:27,59-60)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from resample_oracle import resample_oracle  # noqa: E402


def resample(waveform: torch.Tensor, orig_freq: int, new_freq: int,
             lowpass_filter_width: int = 6, rolloff: float = 0.99,
             **kw) -> torch.Tensor:
    x = waveform.detach().cpu().numpy()
    y = resample_oracle(x, int(orig_freq), int(new_freq),
                        lowpass_filter_width=lowpass_filter_width,
                        rolloff=rolloff)
    return torch.from_numpy(np.ascontiguousarray(y, dtype=np.float32))

#!/usr/bin/env python3
"""Single-sample inference CLI.

Flag parity with /root/reference/src/interface.py:458-529
(--checkpoint --audio --text --use_tta --num_tta), plus --visualize and
--export for the figure / JSON outputs the reference produces
programmatically."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multilingual_multimodal_speech_emotion_recognition_tpu.interface import main

if __name__ == "__main__":
    main()

"""Script-level differential smoke: the reference's OWN entry points vs
this framework's CLIs (scripts/ref_differential.py at reduced scale).

The full harness (48 clips, plain + corrected-TTA + calibrate + train)
is the driver-runnable artifact; this test runs the eval differential at
12 clips so the suite proves end-to-end:

  reference eval.py (unmodified, under tests/refenv/bootstrap.py)
    == cli/import_checkpoint.py + cli/eval.py
  per-utterance predictions, weighted F1, fitted temperature.

Skips (with reason) when /root/reference is absent — the only suite
dependency on the reference checkout, and inherently so: the subject
under test IS the reference's own scripts.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DRIVER = REPO / "scripts" / "ref_differential.py"


@pytest.mark.skipif(not Path("/root/reference/src/eval.py").exists(),
                    reason="reference checkout not present")
def test_eval_script_differential_small(tmp_path):
    env = dict(os.environ, REF_DIFF_CLIPS="12")
    r = subprocess.run(
        [sys.executable, str(DRIVER), "--workdir", str(tmp_path / "rd"),
         "--stages", "synth,preflight,ckpt,ref_eval,import,our_eval,compare"],
        capture_output=True, text=True, env=env, timeout=2400)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    results = json.loads((tmp_path / "rd" / "DIFFERENTIAL.json").read_text())
    for tag in ("plain", "tta", "calibrate"):
        assert results[tag]["ok"], (tag, results[tag])
        assert results[tag]["agreement"] == 1.0
        assert results[tag]["f1_ref"] == pytest.approx(
            results[tag]["f1_ours"], abs=1e-9)
    assert results["temperature"]["ok"]

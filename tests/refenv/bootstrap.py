"""Run one of the reference's OWN entry scripts in this environment.

    python tests/refenv/bootstrap.py <script_path> [script args...]

The script executes UNMODIFIED (runpy, run_name='__main__', current
working directory preserved — the reference resolves audio under
./datasets, preprocess.py:10-12). What this bootstrap supplies is the
environment the script expects:

  * shims on sys.path for the uninstalled deps: torchaudio (stdlib WAV
    load + windowed-sinc resample oracle), librosa (the used feature
    subset), soundfile / whisper (import-only stubs), langdetect (the
    same deterministic detector as frontend/lid.py, so both frameworks
    see identical LID decisions);
  * transformers `from_pretrained` patched to LOCAL from-config tiny
    models (zero egress: no hub weights reachable) with seeded torch
    init, plus a hash-vocabulary tokenizer matching the native
    pipeline's zero-egress fallback (data/tokenizer.py:HashTokenizer) —
    both frameworks therefore tokenize identically;
  * `vad_method` forced to "librosa": webrtcvad is not installed, and
    with it absent the reference's VAD constructor raises
    (quality_gates.py:61-70 has no fallback despite the import-time
    warning claiming one) — "librosa" is the reference's own supported
    alternative, and the one the native frontend implements
    (frontend/quality_gates.py:energy_vad);
  * capture hooks: the reference's `utils.weighted_f1` and
    `sklearn.metrics.classification_report` are wrapped to append their
    (labels, preds, f1) inputs as JSON lines to $REF_DIFF_OUT/capture.jsonl
    so the differential driver can compare per-utterance predictions,
    not just printed text.

Deliberately NOT provided: webrtcvad, noisereduce, pyloudnorm — the
reference's own fallback branches for those (librosa VAD via the forced
method, scipy Wiener, RMS loudness) are exactly what the native frontend
implements, so both frameworks run the same branch of the reference's
logic.
"""

from __future__ import annotations

import json
import os
import runpy
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
REF_SRC = "/root/reference/src"

# geometry of the from-config fixture backbones (matches the differential
# driver's import overrides: --audio_heads 4 --text_heads 4 --conv_stride
# 5,4,4; vocab matches HashTokenizer's default so token ids are in-range)
AUDIO_HIDDEN = 32
TEXT_HIDDEN = 32
BACKBONE_HEADS = 4
VOCAB_SIZE = 250002
SEED = 1234


def _install_shims() -> None:
    sys.path.insert(0, str(HERE / "shims"))
    sys.path.insert(0, REF_SRC)
    # the repo root: the shims borrow small native pieces (HashTokenizer,
    # WAV IO) and must work without the package pip-installed
    sys.path.insert(0, str(HERE.parent.parent))


def _patch_transformers() -> None:
    import torch
    from transformers import (AutoModel, AutoTokenizer, Wav2Vec2Config,
                              Wav2Vec2FeatureExtractor, Wav2Vec2Model,
                              XLMRobertaConfig, XLMRobertaModel)

    def w2v(cls_or_name=None, *a, **kw):
        torch.manual_seed(SEED)
        return Wav2Vec2Model(Wav2Vec2Config(
            hidden_size=AUDIO_HIDDEN, num_hidden_layers=2,
            num_attention_heads=BACKBONE_HEADS, intermediate_size=64,
            conv_dim=(16, 16, 16), conv_stride=(5, 4, 4),
            conv_kernel=(10, 3, 3), num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4, do_stable_layer_norm=False,
            feat_extract_norm="group", apply_spec_augment=False,
            layerdrop=0.0))

    def xlmr(cls_or_name=None, *a, **kw):
        torch.manual_seed(SEED + 1)
        return XLMRobertaModel(XLMRobertaConfig(
            vocab_size=VOCAB_SIZE, hidden_size=TEXT_HIDDEN,
            num_hidden_layers=2, num_attention_heads=BACKBONE_HEADS,
            intermediate_size=64, max_position_embeddings=80,
            type_vocab_size=1, pad_token_id=1))

    def feat_extractor(cls_or_name=None, *a, **kw):
        # facebook/wav2vec2-base preprocessor semantics: per-clip
        # zero-mean/unit-var normalization, NO attention mask
        return Wav2Vec2FeatureExtractor(do_normalize=True,
                                        return_attention_mask=False)

    class _HashTok:
        """transformers-call-compatible wrapper over the native
        HashTokenizer (data/tokenizer.py) — identical ids on both sides."""

        pad_token_id = 1

        def __init__(self):
            from multilingual_multimodal_speech_emotion_recognition_tpu.data.tokenizer import (
                HashTokenizer)
            self._t = HashTokenizer(VOCAB_SIZE)

        def __call__(self, texts, padding=True, truncation=True,
                     return_tensors="pt", max_length=None):
            L = max(len((t or "").split()) + 2 for t in texts)
            if max_length:
                L = min(L, max_length)
            ids, mask = self._t.encode_batch(list(texts), L)
            return {"input_ids": torch.from_numpy(ids).long(),
                    "attention_mask": torch.from_numpy(mask).long()}

    Wav2Vec2Model.from_pretrained = classmethod(
        lambda cls, *a, **kw: w2v())
    Wav2Vec2FeatureExtractor.from_pretrained = classmethod(
        lambda cls, *a, **kw: feat_extractor())
    AutoModel.from_pretrained = classmethod(lambda cls, *a, **kw: xlmr())
    AutoTokenizer.from_pretrained = classmethod(
        lambda cls, *a, **kw: _HashTok())


def _patch_torch_amp() -> None:
    """train.py:151 calls `autocast(enabled=args.use_amp)` — the pre-2.0
    torch signature; installed torch requires device_type. Default it to
    'cpu' so the reference script runs unmodified (AMP itself stays off:
    the differential never passes --use_amp)."""
    import torch.amp as amp
    orig = amp.autocast

    class _Autocast(orig):
        def __init__(self, device_type: str = "cpu", *a, **kw):
            super().__init__(device_type, *a, **kw)

    amp.autocast = _Autocast


def _force_librosa_vad() -> None:
    import importlib
    qg = importlib.import_module("models.quality_gates")
    ae = importlib.import_module("models.audio_encoder")
    orig = qg.create_quality_gates

    def forced(sample_rate=16000, vad_method="webrtc",
               enable_language_detection=True):
        return orig(sample_rate=sample_rate, vad_method="librosa",
                    enable_language_detection=enable_language_detection)

    qg.create_quality_gates = forced
    ae.create_quality_gates = forced  # audio_encoder.py:5 from-import


def _install_capture(out_dir: Path) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    cap = out_dir / "capture.jsonl"

    def dump(kind, **payload):
        with open(cap, "a") as f:
            f.write(json.dumps({"kind": kind, **payload}) + "\n")

    import importlib

    import numpy as np
    utils = importlib.import_module("utils")
    orig_f1 = utils.weighted_f1

    def f1_wrapped(preds, labels):
        v = orig_f1(preds, labels)
        dump("weighted_f1", f1=float(v),
             preds=np.asarray(preds.cpu()).astype(int).tolist(),
             labels=np.asarray(labels.cpu()).astype(int).tolist())
        # np.float64, not float: sklearn >= 1.6 returns a plain Python
        # float, but train_crema_final.py:310 calls `.item()` on the
        # result (written against the older np.float64 return) — the
        # script is unrunnable as shipped on this sklearn (1.9.0).
        # Restoring the era-accurate scalar type is harness shimming,
        # not a semantic change (documented in PARITY.md).
        return np.float64(v)

    utils.weighted_f1 = f1_wrapped

    orig_energy = utils.energy_score

    def energy_wrapped(logits):
        dump("logits", logits=np.asarray(
            logits.detach().cpu()).astype(float).tolist())
        return orig_energy(logits)

    utils.energy_score = energy_wrapped

    import sklearn.metrics as skm
    orig_report = skm.classification_report

    def report_wrapped(y_true, y_pred, *a, **kw):
        dump("classification_report",
             labels=np.asarray(y_true).astype(int).tolist(),
             preds=np.asarray(y_pred).astype(int).tolist())
        return orig_report(y_true, y_pred, *a, **kw)

    skm.classification_report = report_wrapped


def main() -> None:
    script = sys.argv[1]
    sys.argv = [script] + sys.argv[2:]
    out_dir = Path(os.environ.get("REF_DIFF_OUT", "."))

    _install_shims()
    _patch_transformers()
    _patch_torch_amp()
    _force_librosa_vad()
    _install_capture(out_dir)

    import torch
    torch.manual_seed(SEED + 2)

    runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    import torch  # noqa: F401  (ensure torch precedes shims in sys.modules)
    main()

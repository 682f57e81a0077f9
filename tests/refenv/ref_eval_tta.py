"""Deterministic reference-side TTA evaluation, run UNDER bootstrap.py.

The reference's shipped `eval.py --use_tta` is unrunnable: its TTA loop
iterates per-CLIP view lists but encodes each clip's V views against the
full B-text batch (eval.py:176-190), so CrossModalAttention gets q batch
V vs kv batch B — a hard MultiheadAttention shape error whenever
B != num_tta (and a views×texts mix-up even when B == V). This runner
evaluates the reference's INTENDED estimator with the reference's OWN
code: `test_time_augmentation` and the model classes are imported from
the reference source, the only change is pairing each clip's views with
that clip's text (tiled V times) and averaging the V logits — exactly
the estimator eval.py's docstring/structure describes and the one
cli/eval.py --use_tta implements.

usage: ... ref_eval_tta.py <manifest> <checkpoint.pt> <num_tta>
"""

import importlib.util
import sys

import numpy as np
import torch

from models import AudioEncoder, TextEncoder, FusionLayer
from models.classifier import AdvancedOpenMaxClassifier
from models.cross_attention import CrossModalAttention
from models.pooling import AttentiveStatsPooling
from models.prototypes import PrototypeMemory
from data.dataset import SERDataset
from utils import weighted_f1
from sklearn.metrics import classification_report


def _load_eval_module():
    spec = importlib.util.spec_from_file_location(
        "ref_eval", "/root/reference/src/eval.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)  # run_name != __main__: main() not called
    return mod


def main():
    manifest, ckpt_path, num_tta = sys.argv[1], sys.argv[2], int(sys.argv[3])
    ref_eval = _load_eval_module()

    audio_encoder = AudioEncoder()
    text_encoder = TextEncoder()
    audio_hid = audio_encoder.encoder.config.hidden_size
    text_hid = text_encoder.encoder.config.hidden_size
    cross = CrossModalAttention(audio_hid, text_hid, shared_dim=256,
                                num_heads=8)
    pool_a = AttentiveStatsPooling(audio_hid)
    pool_t = AttentiveStatsPooling(text_hid)
    fusion = FusionLayer(audio_hid * 2, text_hid * 2, 512)
    classifier = AdvancedOpenMaxClassifier(input_dim=512, num_labels=6,
                                           num_layers=35, base_dim=512,
                                           dropout=0.15)
    prototypes = PrototypeMemory(6, 512)
    ckpt = torch.load(ckpt_path, map_location="cpu")
    for name, m in (("audio_encoder", audio_encoder),
                    ("text_encoder", text_encoder), ("cross", cross),
                    ("pool_a", pool_a), ("pool_t", pool_t),
                    ("fusion", fusion), ("classifier", classifier),
                    ("prototypes", prototypes)):
        m.load_state_dict(ckpt[name])
        m.eval()

    ds = SERDataset(manifest)
    all_preds, all_labels = [], []
    with torch.no_grad():
        for audio, text, label in ds:
            views = ref_eval.test_time_augmentation([audio], num_tta)[0]
            texts = [text] * len(views)
            a_seq, a_mask = audio_encoder(views, texts)
            t_seq, t_mask = text_encoder(texts)
            a_enh, t_enh = cross(a_seq, t_seq, a_mask, t_mask)
            a_vec = pool_a(a_enh, a_mask)
            t_vec = pool_t(t_enh, t_mask)
            fused = fusion(a_vec, t_vec)
            logits = classifier(fused)           # use_openmax=True default
            logits = logits.mean(dim=0, keepdim=True)
            all_preds.append(int(torch.argmax(logits, dim=1)))
            all_labels.append(int(label))

    f1 = weighted_f1(torch.tensor(all_preds), torch.tensor(all_labels))
    print(f"Weighted F1 Score: {f1:.4f}")
    print(classification_report(np.array(all_labels), np.array(all_preds)))


if __name__ == "__main__":
    main()

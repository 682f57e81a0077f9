"""Deterministic reference-side evaluation of a train.py checkpoint,
run UNDER bootstrap.py.

src/eval.py cannot load train.py's output: it hardcodes num_labels=6
(eval.py:100-107) while train.py trains 4 classes (train.py:19) — a
documented reference bug. And train.py's OWN per-epoch validation is
non-deterministic: its loop sets only audio/text/fusion/classifier to
eval() (train.py:181), leaving CrossModalAttention (dropout 0.1 in its
MultiheadAttention and residual path) and the pools in train mode, so
the printed F1 carries live-dropout noise.

This runner reproduces train.py's validation loop (train.py:183-200 —
same module chain, same `classifier(fused)` default-OpenMax call, texts
passed to the audio encoder) with the reference's OWN modules at the
checkpoint's label count, with .eval() on EVERY module so the result is
deterministic and comparable across frameworks.

usage: ... ref_eval_train4.py <manifest> <checkpoint.pt> <num_labels>
"""

import sys

import numpy as np
import torch

from models import AudioEncoder, TextEncoder, FusionLayer
from models.classifier import AdvancedOpenMaxClassifier
from models.cross_attention import CrossModalAttention
from models.pooling import AttentiveStatsPooling
from models.prototypes import PrototypeMemory
from data.dataset import SERDataset
from torch.utils.data import DataLoader
from utils import weighted_f1
from sklearn.metrics import classification_report


def collate_fn(batch):
    audios, texts, labels = zip(*batch)
    return list(audios), list(texts), torch.tensor(labels, dtype=torch.long)


def main():
    manifest, ckpt_path, num_labels = (sys.argv[1], sys.argv[2],
                                       int(sys.argv[3]))
    audio_encoder = AudioEncoder()
    text_encoder = TextEncoder()
    audio_hid = audio_encoder.encoder.config.hidden_size
    text_hid = text_encoder.encoder.config.hidden_size
    cross = CrossModalAttention(audio_hid, text_hid, shared_dim=256,
                                num_heads=8)
    pool_a = AttentiveStatsPooling(audio_hid)
    pool_t = AttentiveStatsPooling(text_hid)
    fusion = FusionLayer(audio_hid * 2, text_hid * 2, 512)
    classifier = AdvancedOpenMaxClassifier(input_dim=512,
                                           num_labels=num_labels,
                                           num_layers=35, base_dim=512,
                                           dropout=0.15)
    prototypes = PrototypeMemory(num_labels, 512)
    ckpt = torch.load(ckpt_path, map_location="cpu")
    modules = (("audio_encoder", audio_encoder),
               ("text_encoder", text_encoder), ("cross", cross),
               ("pool_a", pool_a), ("pool_t", pool_t), ("fusion", fusion),
               ("classifier", classifier), ("prototypes", prototypes))
    for name, m in modules:
        m.load_state_dict(ckpt[name])
        m.eval()

    loader = DataLoader(SERDataset(manifest), batch_size=4, shuffle=False,
                        collate_fn=collate_fn)
    all_preds, all_labels = [], []
    with torch.no_grad():
        for audio_list, text_list, labels in loader:
            # train.py:187-194 verbatim chain (texts reach the gates)
            a_seq, a_mask = audio_encoder(audio_list, text_list)
            t_seq, t_mask = text_encoder(text_list)
            a_enh, t_enh = cross(a_seq, t_seq, a_mask, t_mask)
            a_vec = pool_a(a_enh, a_mask)
            t_vec = pool_t(t_enh, t_mask)
            fused = fusion(a_vec, t_vec)
            logits = classifier(fused)
            all_preds.extend(torch.argmax(logits, dim=1).tolist())
            all_labels.extend(labels.tolist())

    f1 = weighted_f1(torch.tensor(all_preds), torch.tensor(all_labels))
    print(f"Weighted F1 Score: {f1:.4f}")
    print(classification_report(np.array(all_labels), np.array(all_preds)))


if __name__ == "__main__":
    main()

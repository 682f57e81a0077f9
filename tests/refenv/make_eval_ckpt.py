"""Build a reference-layout 6-class checkpoint for the eval.py differential.

Run UNDER tests/refenv/bootstrap.py. Constructs the exact module set
eval.py constructs (/root/reference/src/eval.py:92-107 — tiny patched
backbones, cross shared=256/heads=8, AdvancedOpenMaxClassifier
512/6/35/512/0.15), seeds the weights, fits real Weibull buffers on
synthetic features (so eval.py's use_openmax=True path does non-trivial
adjustment), and saves the trainers' 8-state_dict .pt layout
(src/train.py:247-263).

usage: ... make_eval_ckpt.py <out.pt>
"""

import sys

import torch

from models import AudioEncoder, TextEncoder, FusionLayer
from models.classifier import AdvancedOpenMaxClassifier
from models.cross_attention import CrossModalAttention
from models.pooling import AttentiveStatsPooling
from models.prototypes import PrototypeMemory


def main():
    out = sys.argv[1]
    torch.manual_seed(7)
    audio_encoder = AudioEncoder()
    text_encoder = TextEncoder()
    audio_hid = audio_encoder.encoder.config.hidden_size
    text_hid = text_encoder.encoder.config.hidden_size
    cross = CrossModalAttention(audio_hid, text_hid, shared_dim=256,
                                num_heads=8)
    pool_a = AttentiveStatsPooling(audio_hid)
    pool_t = AttentiveStatsPooling(text_hid)
    fusion = FusionLayer(audio_hid * 2, text_hid * 2, 512)
    classifier = AdvancedOpenMaxClassifier(
        input_dim=512, num_labels=6, num_layers=35, base_dim=512,
        dropout=0.15)
    prototypes = PrototypeMemory(6, 512)

    # real (non-degenerate) Weibull buffers: fit on synthetic penultimate
    # features so openmax_forward does per-sample work at eval time
    torch.manual_seed(11)
    feats = torch.randn(120, 256) * 0.8
    labels = torch.arange(120) % 6
    feats += torch.nn.functional.one_hot(labels, 6).float().repeat(
        1, 256 // 6 + 1)[:, :256] * 1.5
    classifier.fit_weibull(feats, labels)

    ckpt = {
        "audio_encoder": audio_encoder.state_dict(),
        "text_encoder": text_encoder.state_dict(),
        "cross": cross.state_dict(),
        "pool_a": pool_a.state_dict(),
        "pool_t": pool_t.state_dict(),
        "fusion": fusion.state_dict(),
        "classifier": classifier.state_dict(),
        "prototypes": prototypes.state_dict(),
        "optimizer": {"state": {}, "param_groups": []},
        "scheduler": {"last_epoch": 0},
        "epoch": 0,
        "f1": 0.0,
    }
    torch.save(ckpt, out)
    print(f"saved 6-class reference checkpoint: {out}")


if __name__ == "__main__":
    main()

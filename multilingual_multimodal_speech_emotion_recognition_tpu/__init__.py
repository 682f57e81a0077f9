"""TPU-native multilingual multimodal speech emotion recognition framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the PyTorch
reference (kananmittal/Multilingual-Multimodal-Speech-Emotion-Recognition):
frozen Wav2Vec2 + XLM-RoBERTa encoders with bottleneck adapters, bidirectional
cross-modal attention, attentive-statistics pooling, gated fusion, a deep
residual OpenMax classifier with class-anchor clustering, prototype memory,
and the training/eval/calibration stack around them.

Everything on the compute path is a pure function over parameter pytrees so
the whole forward/backward runs as a single jitted XLA program, sharded over
a `jax.sharding.Mesh` (data/model axes) instead of the reference's eager
single-device loop.
"""

__version__ = "0.1.0"

# Short import alias used throughout docs/tests:
#   import multilingual_multimodal_speech_emotion_recognition_tpu as mmser

from . import config  # lightweight; everything else imports lazily


def __getattr__(name):
    """Lazy submodule access (keeps `import mmser` fast and avoids pulling
    jax/transformers until a subsystem is actually used)."""
    import importlib
    if name in ("data", "eval", "frontend", "integration", "interface",
                "models", "ops", "parallel", "research", "train", "utils"):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

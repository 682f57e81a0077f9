"""Optimizer: per-component AdamW groups + LR schedules.

Parity targets:
  * param groups and their lr multipliers / weight decays —
    /root/reference/src/train.py:72-83 (encoders lr x0.1 wd .025; cross/pool/
    fusion lr x1 wd .05; deep classifier lr x1.5 wd .06; anchors lr x2 wd .04;
    uncertainty lr x1 wd .05; prototypes lr x1 wd .05).
  * linear-warmup + cosine schedule — train.py:114-121.
  * warmup + cosine-with-restarts — train_crema.py:45-69 preset.

Frozen backbones (requires_grad=False in the reference,
audio_encoder.py:15-17 / text_encoder.py:13-15) are expressed as an optax
`set_to_zero` group, so their gradients are never materialized into updates
and the whole step stays one fused XLA program.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import optax


def warmup_cosine_schedule(base_lr: float, total_steps: int,
                           warmup_ratio: float = 0.1) -> Callable:
    warmup_steps = int(total_steps * warmup_ratio)

    def sched(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, warmup_steps)
        progress = (step - warmup_steps) / max(1, total_steps - warmup_steps)
        cos = 0.5 * (1.0 + jnp.cos(progress * math.pi))
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return sched


def warmup_cosine_restarts_schedule(base_lr: float, first_cycle_steps: int,
                                    warmup_steps: int = 0,
                                    min_lr_ratio: float = 0.0,
                                    gamma: float = 1.0) -> Callable:
    """Cosine annealing with warm restarts (train_crema.py:45-69 semantics:
    fixed cycle length, per-cycle warmup, optional amplitude decay gamma)."""

    def sched(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        cycle = jnp.floor(step / first_cycle_steps)
        in_cycle = step - cycle * first_cycle_steps
        amp = base_lr * jnp.power(gamma, cycle)
        warm = in_cycle / max(1, warmup_steps) if warmup_steps > 0 else 1.0
        progress = ((in_cycle - warmup_steps)
                    / max(1, first_cycle_steps - warmup_steps))
        cos = min_lr_ratio + (1 - min_lr_ratio) * 0.5 * (1 + jnp.cos(progress * math.pi))
        if warmup_steps > 0:
            return amp * jnp.where(in_cycle < warmup_steps, warm, cos)
        return amp * cos

    return sched


# group name -> (lr multiplier, weight decay); train.py:72-83
GROUPS = {
    "audio": (0.1, 0.025),
    "text": (0.1, 0.025),
    "mid": (1.0, 0.05),       # cross, pool_a, pool_t, fusion
    "deep": (1.5, 0.06),      # deep classifier backbone + output head
    "anchor": (2.0, 0.04),
    "uncertainty": (1.0, 0.05),
    "proto": (1.0, 0.05),
}


def param_labels(params: dict, *, freeze_backbones: bool = True) -> dict:
    """Label each leaf with its optimizer group."""

    def label_top(name: str, sub):
        if name in ("audio_backbone",):
            g = "frozen" if freeze_backbones else "audio"
        elif name in ("text_backbone",):
            g = "frozen" if freeze_backbones else "text"
        elif name in ("audio_adapter", "combined_fusion", "quality_fusion",
                      "conditioning_fusion", "quality_proj", "cond_proj"):
            # the feature projections live inside audio_encoder's submodules
            # in the reference (quality_gates.py:438, audio_conditioning.py:455)
            # so they ride the encoder param group (train.py:72-75)
            g = "audio"
        elif name in ("text_adapter", "asr_fusion", "asr_proj"):
            # asr_proj: the reference's asr_projection is created lazily
            # AFTER optimizer construction (text_encoder.py:39-48) and thus
            # never trained there — we put it with the text group instead
            # (documented divergence; the reference behavior is a bug class)
            g = "text"
        elif name in ("cross", "pool_a", "pool_t", "fusion"):
            g = "mid"
        elif name == "prototypes":
            g = "proto"
        elif name == "classifier":
            return {
                k: jax.tree.map(lambda _: {
                    "anchor": "anchor",
                    "uncertainty": "uncertainty",
                    "weibull": "frozen",
                }.get(k, "deep"), v)
                for k, v in sub.items()
            }
        else:
            g = "mid"
        return jax.tree.map(lambda _: g, sub)

    return {k: label_top(k, v) for k, v in params.items()}


def build_optimizer(params: dict, base_schedule_factory: Callable[[float], Callable],
                    *, freeze_backbones: bool = True,
                    grad_clip: Optional[float] = None,
                    backbone_moment_dtype=None) -> optax.GradientTransformation:
    """base_schedule_factory(scaled_base_lr) -> schedule fn. Each group gets
    its own adamw with the reference's lr multiplier and weight decay.

    backbone_moment_dtype (e.g. jnp.bfloat16): store the audio/text
    backbone groups' FIRST AdamW moment in that dtype (optax mu_dtype —
    the second moment stays f32; optax exposes no nu_dtype). An unfrozen-
    fine-tune HBM lever: the ~370 M backbone params dominate the moment
    memory, and mu tolerates bf16 (it is a smooth EMA re-read through the
    f32 update math each step). Head groups always keep f32 moments."""
    transforms = {"frozen": optax.set_to_zero()}
    for name, (mult, wd) in GROUPS.items():
        mu_dtype = (backbone_moment_dtype if name in ("audio", "text")
                    else None)
        transforms[name] = optax.adamw(
            learning_rate=base_schedule_factory(mult), weight_decay=wd,
            mu_dtype=mu_dtype)
    labels = param_labels(params, freeze_backbones=freeze_backbones)
    tx = optax.multi_transform(transforms, labels)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def make_train_optimizer(params: dict, *, lr: float, total_steps: int,
                         warmup_ratio: float = 0.1,
                         scheduler: str = "warmup_cosine",
                         restart_steps: int = 0,
                         freeze_backbones: bool = True,
                         grad_clip: Optional[float] = None,
                         backbone_moment_dtype=None):
    if scheduler == "warmup_cosine":
        factory = lambda mult: warmup_cosine_schedule(
            lr * mult, total_steps, warmup_ratio)
    elif scheduler == "cosine_restarts":
        factory = lambda mult: warmup_cosine_restarts_schedule(
            lr * mult, max(1, restart_steps),
            warmup_steps=int(restart_steps * warmup_ratio))
    else:
        raise ValueError(f"unknown scheduler {scheduler!r}")
    return build_optimizer(params, factory, freeze_backbones=freeze_backbones,
                           grad_clip=grad_clip,
                           backbone_moment_dtype=backbone_moment_dtype)

"""Knowledge distillation: train a small student from a flagship teacher.

The reference has no deployment-scale story beyond its ~380M-parameter
two-backbone pipeline (ARCHITECTURE_DOCUMENTATION.md:400-406 and the
one-shot CLI at src/interface.py:423-470). This module adds the standard
production path the reference lacks: distill the trained flagship into a
small randomly-initialized student (Hinton-style soft targets + hard
labels, optional pooled-feature matching), producing an ordinary native
checkpoint — the student's config rides in the checkpoint, so every
downstream surface (cli/eval.py, interface, AOT export, the serving
daemon, int8 quant) works on it unchanged.

TPU shape: teacher and student run in ONE jitted step — the teacher
forward is deterministic and stop-gradiented, so XLA schedules it as
inference fused with the student's training step; no second process, no
host round trip of logits. Teacher params are jit ARGUMENTS (never baked
constants — the axon relay rejects large programs, CLAUDE.md).

Loss (per valid example, mean over the batch):
  alpha * tau^2 * KL(softmax(t/tau) || softmax(s/tau))   soft targets
  + (1 - alpha) * CE_label_smoothed(s, y)                 hard labels
  + feature_match_weight * MSE(P(fused_s), fused_t)       optional,
    P a learned [student proj_dim -> teacher proj_dim] linear that lives
    only during distillation (stripped from the saved checkpoint).
The tau^2 factor keeps soft-target gradient magnitude independent of
temperature (Hinton et al., 2015).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import Config, ModelConfig, TrainConfig, to_json
from ..data.pipeline import BucketedLoader, SERDataset
from ..data.prefetch import device_prefetch
from ..data.tokenizer import Tokenizer, get_tokenizer
from ..models import layers, model as mdl
from ..parallel import mesh as mesh_lib
from ..utils.metrics import MetricsWriter, weighted_f1
from . import checkpoint as ckpt_lib, loop as loop_lib, optimizer as opt_lib
from ..data import pipeline as pipeline_mod
from ..ops import losses


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    temperature: float = 4.0
    alpha: float = 0.9               # soft-target weight; 1-alpha on CE
    feature_match_weight: float = 0.0
    student_preset: str = "small"


STUDENT_PRESETS = ("small", "tiny")


def student_model_config(teacher: ModelConfig,
                         preset: str = "small") -> ModelConfig:
    """A scaled-down ModelConfig that keeps every interface the teacher's
    batches need (tokenizer vocab, front-end flags, label count) while
    shrinking the compute. 'small' is 119M params vs the flagship's 397M
    — 96M of that is the shared 250k-vocab embedding table, so the actual
    per-clip COMPUTE shrinks ~10x; 'tiny' is for tests/edge serving."""
    if preset == "small":
        audio = dataclasses.replace(
            teacher.audio, conv_dim=(256,) * 7, hidden_size=384,
            num_hidden_layers=6, num_attention_heads=6,
            intermediate_size=1536, num_conv_pos_embeddings=64,
            num_conv_pos_embedding_groups=8)
        text = dataclasses.replace(
            teacher.text, hidden_size=384, num_hidden_layers=4,
            num_attention_heads=6, intermediate_size=1536)
        head_kw = dict(adapter_dim=128, shared_dim=128, num_heads=4,
                       proj_dim=256, classifier_layers=8,
                       classifier_base_dim=256)
    elif preset == "tiny":
        audio = dataclasses.replace(
            teacher.audio, conv_dim=(64,) * len(teacher.audio.conv_dim),
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4)
        text = dataclasses.replace(
            teacher.text, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128)
        head_kw = dict(adapter_dim=16, shared_dim=32, num_heads=4,
                       proj_dim=64, classifier_layers=3,
                       classifier_base_dim=64)
    else:
        raise ValueError(f"unknown student preset {preset!r}; "
                         f"choose from {STUDENT_PRESETS}")
    return dataclasses.replace(teacher, audio=audio, text=text, **head_kw)


def _kd_loss(student_logits, teacher_logits, tau):
    """tau^2 * KL(teacher_soft || student_soft), mean over the batch.
    Train batches are always full (drop_remainder=True; example_mask is a
    host-only key, pipeline.TRAIN_HOST_KEYS), so the plain mean is the
    masked mean."""
    t = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / tau)
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / tau)
    kl = (jnp.exp(t) * (t - s)).sum(-1)                        # [B]
    return tau * tau * kl.mean()


def make_distill_step(teacher_cfg: ModelConfig, student_cfg: ModelConfig,
                      tcfg: TrainConfig, dcfg: DistillConfig, tx):
    """One jitted step: teacher inference + student update."""

    def compute_loss(params, teacher_params, batch, key):
        t_out = mdl.model_forward(teacher_params, teacher_cfg, batch,
                                  deterministic=True)
        t_logits = jax.lax.stop_gradient(t_out.logits)
        t_fused = jax.lax.stop_gradient(t_out.fused)

        s_out = mdl.model_forward(params, student_cfg, batch,
                                  deterministic=False, dropout_key=key)
        kd = _kd_loss(s_out.logits, t_logits, dcfg.temperature)
        ce = losses.label_smoothing_cross_entropy(
            s_out.logits, batch["labels"], smoothing=tcfg.label_smoothing)
        loss = dcfg.alpha * kd + (1.0 - dcfg.alpha) * ce
        fm = jnp.zeros((), jnp.float32)
        if dcfg.feature_match_weight > 0:
            proj = layers.linear(params["distill_proj"],
                                 s_out.fused.astype(jnp.float32))
            fm = jnp.square(proj - t_fused.astype(jnp.float32)).mean()
            loss = loss + dcfg.feature_match_weight * fm

        agree = (s_out.logits.argmax(-1) == t_logits.argmax(-1)).mean()
        acc = (s_out.logits.argmax(-1) == batch["labels"]).mean()
        return loss, {"loss": loss, "kd": kd, "ce": ce, "feature_match": fm,
                      "teacher_agreement": agree, "accuracy": acc}

    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def step(params, teacher_params, opt_state, batch, key):
        (_, aux), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(params, teacher_params, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux

    return step


def distill(teacher_params: Dict, teacher_cfg: Config, *,
            train_manifest: str, val_manifest: str,
            dcfg: DistillConfig = DistillConfig(),
            train_cfg: Optional[TrainConfig] = None,
            tokenizer: Optional[Tokenizer] = None,
            mesh=None, progress: bool = True) -> Dict:
    """Run distillation; returns {'params', 'config', 'history', 'best_f1',
    'best_path'}. The saved checkpoints are ordinary native checkpoints of
    the STUDENT (its config embedded), loadable by every serving surface."""
    tcfg = train_cfg or teacher_cfg.train
    student_mcfg = student_model_config(teacher_cfg.model,
                                        dcfg.student_preset)
    student_cfg = dataclasses.replace(teacher_cfg, model=student_mcfg,
                                      train=tcfg)
    tok = tokenizer or get_tokenizer(
        vocab_size=student_mcfg.text.vocab_size)
    mesh = mesh or mesh_lib.mesh_from_config(teacher_cfg.mesh)

    train_loader = BucketedLoader(SERDataset(train_manifest, teacher_cfg.data),
                                  batch_size=tcfg.batch_size, tokenizer=tok,
                                  shuffle=True, seed=tcfg.seed,
                                  drop_remainder=True)
    val_loader = BucketedLoader(SERDataset(val_manifest, teacher_cfg.data),
                                batch_size=tcfg.batch_size, tokenizer=tok,
                                shuffle=False, seed=0)

    key = jax.random.key(tcfg.seed)
    k_init, k_proj, key = jax.random.split(key, 3)
    params = mdl.init_model(k_init, student_mcfg)
    if dcfg.feature_match_weight > 0:
        params["distill_proj"] = layers.init_linear(
            k_proj, student_mcfg.proj_dim, teacher_cfg.model.proj_dim)
    params = mesh_lib.shard_params(params, mesh)
    teacher_params = mesh_lib.shard_params(teacher_params, mesh)

    steps_per_epoch = max(1, train_loader.batches_per_epoch())
    tx = opt_lib.make_train_optimizer(
        params, lr=tcfg.lr, total_steps=steps_per_epoch * tcfg.epochs,
        warmup_ratio=tcfg.warmup_ratio, scheduler=tcfg.scheduler,
        restart_steps=steps_per_epoch * tcfg.restart_period_epochs,
        freeze_backbones=False,  # the student trains end-to-end
        grad_clip=tcfg.grad_clip)
    opt_state = tx.init(params)
    step_fn = make_distill_step(teacher_cfg.model, student_mcfg, tcfg, dcfg,
                                tx)

    writer = MetricsWriter(str(Path(tcfg.save_dir) / "distill_metrics.jsonl"))
    history, best_f1, best_path = [], -1.0, None

    def put(b):
        return mesh_lib.shard_batch(
            {k: v for k, v in b.items()
             if k not in pipeline_mod.TRAIN_HOST_KEYS}, mesh)

    for epoch in range(tcfg.epochs):
        t0 = time.time()
        last_aux = None
        for dev_batch, _ in device_prefetch(train_loader.epoch(epoch), put):
            key, k_step = jax.random.split(key)
            params, opt_state, last_aux = step_fn(
                params, teacher_params, opt_state, dev_batch, k_step)

        ev = loop_lib.evaluate(params, student_cfg, val_loader, mesh)
        f1 = weighted_f1(ev["preds"], ev["labels"],
                         student_mcfg.num_labels)
        aux_host = {k: float(v) for k, v in (last_aux or {}).items()}
        rec = {"epoch": epoch, "val_f1": float(f1),
               "epoch_seconds": round(time.time() - t0, 2), **aux_host}
        history.append(rec)
        writer.write(rec)
        if progress:
            print(f"[distill] epoch {epoch}: f1={f1:.4f} "
                  f"kd={aux_host.get('kd', 0):.4f} "
                  f"agree={aux_host.get('teacher_agreement', 0):.3f}")

        if f1 >= best_f1:
            best_f1 = f1
            save_params = {k: v for k, v in params.items()
                           if k != "distill_proj"}
            best_path = ckpt_lib.save_checkpoint(
                Path(tcfg.save_dir) / f"student_epoch_{epoch}",
                params=save_params, step=(epoch + 1) * steps_per_epoch,
                epoch=epoch, f1=float(f1),
                config_json=to_json(student_cfg))

    return {"params": params, "config": student_cfg, "history": history,
            "best_f1": best_f1, "best_path": str(best_path)}

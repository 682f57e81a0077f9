"""Jitted training / evaluation steps.

Loss mix parity: /root/reference/src/train.py:151-168 —
  loss = label_smoothed_CE
       + 0.3  * class_balanced_focal
       + 0.1  * anchor_clustering_loss        (identically 0 — kept)
       + 0.05 * mean(uncertainty * correct)
       + 0.01 * prototype_loss                (gated on --proto_weight > 0)
SupCon is instantiated but never added in the reference (train.py:86,
README "disabled") — exposed here behind `supcon_weight`.

The whole step — forward, multi-term loss, backward, per-group AdamW
update — is one jitted XLA program; under a Mesh the gradient all-reduce is
emitted automatically from the batch/param shardings.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig, TrainConfig
from ..models import model as mdl
from ..models import prototypes as protos
from ..ops import losses

Array = jax.Array


class StepMetrics(NamedTuple):
    loss: Array
    ce: Array
    focal: Array
    anchor: Array
    uncertainty: Array
    proto: Array
    supcon: Array
    accuracy: Array


def compute_loss(params: dict, model_cfg: ModelConfig, train_cfg: TrainConfig,
                 batch: dict, *, dropout_key: Optional[Array] = None,
                 deterministic: bool = False):
    if train_cfg.freeze_backbones:
        # the reference freezes with requires_grad=False, so torch never
        # runs the backbone backward; stop_gradient gives XLA the same
        # pruning (optax set_to_zero alone would still compute those grads)
        params = {**params,
                  "audio_backbone": jax.lax.stop_gradient(params["audio_backbone"]),
                  "text_backbone": jax.lax.stop_gradient(params["text_backbone"])}
    out = mdl.model_forward(params, model_cfg, batch,
                            deterministic=deterministic,
                            dropout_key=dropout_key, use_openmax=False,
                            spec_augment=not deterministic)
    labels = batch["labels"]
    ce = losses.label_smoothing_cross_entropy(
        out.logits, labels, smoothing=train_cfg.label_smoothing)
    focal = losses.class_balanced_focal_loss(
        out.logits, labels, num_classes=model_cfg.num_labels,
        beta=train_cfg.focal_beta, gamma=train_cfg.focal_gamma)
    unc = losses.uncertainty_regularizer(out.uncertainty, out.logits, labels)
    loss = (ce + train_cfg.focal_weight * focal
            + train_cfg.anchor_weight * out.anchor_loss
            + train_cfg.uncertainty_weight * unc)
    if train_cfg.proto_weight > 0:
        fused = out.fused
        if train_cfg.proto_l2_normalize:
            # train_crema.py:330 computes the prototype loss on the
            # L2-normalized fused vector
            fused = fused / jnp.maximum(
                jnp.linalg.norm(fused, axis=-1, keepdims=True), 1e-8)
        proto = protos.prototype_loss(params["prototypes"], fused, labels)
        loss = loss + train_cfg.proto_term_weight * proto
    else:
        proto = jnp.zeros(())
    if train_cfg.supcon_weight > 0:
        sup = losses.supcon_loss(out.fused, labels)
        loss = loss + train_cfg.supcon_weight * sup
    else:
        sup = jnp.zeros(())
    acc = jnp.mean((jnp.argmax(out.logits, -1) == labels).astype(jnp.float32))
    metrics = StepMetrics(loss=loss, ce=ce, focal=focal,
                          anchor=out.anchor_loss, uncertainty=unc,
                          proto=proto, supcon=sup, accuracy=acc)
    return loss, metrics


def make_train_step(model_cfg: ModelConfig, train_cfg: TrainConfig, tx,
                    donate: bool = True):
    """Build the jitted train step closure over the optimizer. With
    train_cfg.augment, the reference's online augmentation
    (train.py:130-143) runs *inside* the step as batched device DSP."""

    def step(params: dict, opt_state, batch: dict, rng: Array):
        if train_cfg.augment:
            from ..ops import audio_dsp
            rng, k_aug = jax.random.split(rng)
            wave, mask = audio_dsp.augment_batch(
                k_aug, batch["audio"], batch["audio_mask"],
                speed_per_batch=train_cfg.augment_speed_per_batch)
            batch = {**batch, "audio": wave, "audio_mask": mask}

        if train_cfg.consistency_aug_weight > 0:
            # one coin per OPTIMIZER batch (train_crema_final.py:283 flips
            # per step): under grad_accum the gate must not be re-flipped
            # per microbatch, or one update could mix gated/ungated
            # microbatches — a composition the accum=1 path can't produce
            rng, k_gate = jax.random.split(rng)
            aug_gate = (jax.random.uniform(k_gate)
                        < train_cfg.consistency_aug_fraction)
        else:
            aug_gate = None

        def loss_fn(p, key, mb):
            loss, metrics = compute_loss(p, model_cfg, train_cfg, mb,
                                         dropout_key=key, deterministic=False)
            if train_cfg.consistency_aug_weight > 0:
                # train_crema_final.py:283-292 — a second forward on an
                # independently-augmented view, extra CE on a fraction of
                # steps (jnp.where keeps the graph static)
                from ..ops import audio_dsp, losses as loss_ops
                k_aug2, k_drop = jax.random.split(key)
                wave2, mask2 = audio_dsp.augment_batch(
                    k_aug2, mb["audio"], mb["audio_mask"],
                    speed_per_batch=train_cfg.augment_speed_per_batch)
                aug_batch = {**mb, "audio": wave2, "audio_mask": mask2}
                out2 = mdl.model_forward(p, model_cfg, aug_batch,
                                         deterministic=False,
                                         dropout_key=k_drop,
                                         use_openmax=False)
                ce2 = loss_ops.label_smoothing_cross_entropy(
                    out2.logits, mb["labels"],
                    smoothing=train_cfg.label_smoothing)
                loss = loss + jnp.where(
                    aug_gate, train_cfg.consistency_aug_weight * ce2, 0.0)
                # keep telemetry equal to the optimized objective
                metrics = metrics._replace(loss=loss)
            return loss, metrics

        accum = max(1, int(train_cfg.grad_accum))
        if accum == 1:
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, rng, batch)
        else:
            # Gradient accumulation: lax.scan over `accum` microbatches so
            # forward/backward activation memory is bounded by batch/accum
            # rows while the optimizer still sees the full effective batch.
            # One XLA program, one optimizer update — the loader, scheduler,
            # and checkpoint cadence are untouched. Batch-statistic loss
            # terms (class-balanced focal's per-batch bincount,
            # losses.py:41-64 parity) are computed per microbatch — the
            # standard accumulation semantics; the mean-reduced terms (CE,
            # uncertainty, proto) average to exactly the full-batch value.
            b0 = batch["labels"].shape[0]
            if b0 % accum != 0:
                raise ValueError(
                    f"batch size {b0} not divisible by grad_accum {accum}")
            rows = {k: v for k, v in batch.items()
                    if hasattr(v, "ndim") and v.ndim >= 1
                    and v.shape[0] == b0}
            rest = {k: v for k, v in batch.items() if k not in rows}
            micro = {k: v.reshape((accum, b0 // accum) + v.shape[1:])
                     for k, v in rows.items()}
            keys = jax.random.split(rng, accum)

            def body(gsum, xs):
                key, mb = xs
                (_, m), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, key, {**mb, **rest})
                return jax.tree.map(jnp.add, gsum, g), m

            gsum0 = jax.tree.map(jnp.zeros_like, params)
            gsum, mstack = jax.lax.scan(body, gsum0, (keys, micro))
            grads = jax.tree.map(lambda g: g / accum, gsum)
            metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0), mstack)
        # non-finite guard: skip the update, like train_crema.py:360-368
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(gnorm) & jnp.isfinite(metrics.loss)
        grads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = jax.tree.map(lambda n, o: jnp.where(ok, n, o),
                                  new_params, params)
        new_opt_state = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o) if hasattr(n, "dtype") else n,
            new_opt_state, opt_state)
        return new_params, new_opt_state, metrics

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


@functools.lru_cache(maxsize=16)
def make_eval_step(model_cfg: ModelConfig, *, use_openmax: bool = False):
    """Cached by (frozen) config so repeated calls reuse one jitted program
    — rebuilding the closure each epoch would defeat jit's trace cache."""
    def step(params: dict, batch: dict):
        out = mdl.model_forward(params, model_cfg, batch, deterministic=True,
                                use_openmax=use_openmax)
        return out.logits, out.features, out.uncertainty

    return jax.jit(step)

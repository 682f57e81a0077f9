"""Few-shot adaptation: fine-tune fusion/classifier/prototypes on K shots,
measure recovery of the zero-shot → full-fine-tune gap.

Parity with /root/reference/src/evaluation/few_shot_adaptation.py: K ∈
{10, 25, 50, 100, 250, 500} (:171), seeded random shot selection (seed 42,
:61), AdamW lr 1e-4 wd 0.01 over fusion+classifier+prototypes only with
frozen encoders/cross/pools (:83-95), 5 adaptation epochs batch 4 (:71-76),
plain CE loss (:120), recovery_rate = max(0, (gap_zero_shot − gap_K)/
gap_zero_shot)·100 (:208-215).

TPU-native: adaptation is the same jitted train step machinery with a
freeze label-set; the "deep copy" is free (params are immutable pytrees).
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ModelConfig
from ..models import model as mdl
from ..utils import metrics as M

DEFAULT_SHOTS = (10, 25, 50, 100, 250, 500)


@dataclass
class FewShotResult:
    num_shots: int
    f1_score: float
    accuracy: float
    recovery_rate: float


def adaptation_labels(params: dict) -> dict:
    """Optimizer labels: train fusion/classifier/prototypes, freeze the rest
    (few_shot_adaptation.py:83-95)."""
    trainable = {"fusion", "classifier", "prototypes"}
    return {k: jax.tree.map(lambda _: "train" if k in trainable else "frozen", v)
            for k, v in params.items()}


def make_adapt_step(model_cfg: ModelConfig, tx):
    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            fwd = {k: v for k, v in batch.items()
                   if k not in ("labels", "example_mask")}
            out = mdl.model_forward(p, model_cfg, fwd, deterministic=False,
                                    dropout_key=rng, use_openmax=False)
            logp = jax.nn.log_softmax(out.logits)
            onehot = jax.nn.one_hot(batch["labels"], out.logits.shape[-1])
            ce = -(onehot * logp).sum(-1)
            # padded rows (partial final batch) carry example_mask 0 and
            # must not contaminate the K-shot objective
            w = batch.get("example_mask")
            if w is None:
                return ce.mean()
            return (ce * w).sum() / jnp.maximum(w.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, loss

    return jax.jit(step)


def adapt(params: dict, model_cfg: ModelConfig,
          batches_fn: Callable[[], Sequence[dict]], *,
          num_epochs: int = 5, lr: float = 1e-4, seed: int = 42) -> dict:
    """Run the adaptation loop; returns adapted params (base params are
    untouched — immutable pytrees replace the reference's deep copy)."""
    tx = optax.multi_transform(
        {"train": optax.adamw(lr, weight_decay=0.01),
         "frozen": optax.set_to_zero()},
        adaptation_labels(params))
    opt_state = tx.init(params)
    step = make_adapt_step(model_cfg, tx)
    key = jax.random.key(seed)
    for _ in range(num_epochs):
        for batch in batches_fn():
            key, k = jax.random.split(key)
            params, opt_state, _ = step(params, opt_state, batch, k)
    return params


def select_shots(n_items: int, num_shots: int, seed: int = 42):
    """(shot_indices, eval_indices) — seeded like the reference (:61-66)."""
    rng = random.Random(seed)
    num_shots = min(num_shots, n_items)
    shots = rng.sample(range(n_items), num_shots)
    shot_set = set(shots)
    return shots, [i for i in range(n_items) if i not in shot_set]


def recovery_rate(zero_shot_f1: float, adapted_f1: float,
                  full_ft_f1: float) -> float:
    """Percent of the zero-shot→full-FT gap recovered (:208-215)."""
    adaptation_gap = full_ft_f1 - zero_shot_f1
    if adaptation_gap <= 0:
        return 0.0
    performance_gap = full_ft_f1 - adapted_f1
    return max(0.0, (adaptation_gap - performance_gap) / adaptation_gap) * 100.0


def run_few_shot_suite(params: dict, model_cfg: ModelConfig, *,
                       make_batches: Callable[[List[int]], Sequence[dict]],
                       evaluate: Callable[[dict, List[int]], Dict[str, float]],
                       n_items: int,
                       shots: Sequence[int] = DEFAULT_SHOTS,
                       zero_shot_f1: Optional[float] = None,
                       full_ft_f1: Optional[float] = None,
                       num_epochs: int = 5, seed: int = 42
                       ) -> List[FewShotResult]:
    """Full K-shot sweep. `make_batches(indices)` yields train batches over
    those items; `evaluate(params, indices)` returns {'f1', 'accuracy'} on
    the held-out items."""
    results = []
    for k in shots:
        shot_idx, eval_idx = select_shots(n_items, k, seed)
        adapted = adapt(params, model_cfg, lambda: make_batches(shot_idx),
                        num_epochs=num_epochs, seed=seed)
        m = evaluate(adapted, eval_idx)
        rec = 0.0
        if zero_shot_f1 is not None and full_ft_f1 is not None:
            rec = recovery_rate(zero_shot_f1, m["f1"], full_ft_f1)
        results.append(FewShotResult(num_shots=k, f1_score=m["f1"],
                                     accuracy=m["accuracy"],
                                     recovery_rate=rec))
    return results


def few_shot_report(results: List[FewShotResult]) -> str:
    lines = ["Few-Shot Adaptation", "===================",
             f"{'shots':<8} {'F1':<8} {'accuracy':<10} {'recovery':<10}"]
    for r in results:
        rec = f"{r.recovery_rate:.1f}%" if r.recovery_rate > 0 else "N/A"
        lines.append(f"{r.num_shots:<8} {r.f1_score:<8.4f} "
                     f"{r.accuracy:<10.4f} {rec:<10}")
    return "\n".join(lines)

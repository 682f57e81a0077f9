"""Remat (gradient checkpointing) policy resolution, shared by both
encoder stacks (wav2vec2.py / xlmr.py scan bodies).

The reference's checkpointing flag is dead code (SURVEY.md §2: the
DeepClassifier builds a use_checkpoint path its own forward never takes);
here remat is real and policy-selectable because it is THE memory/FLOPs
lever for the unfrozen (phase-2 fine-tune) train step:

  True / "full"  rematerialize everything in the layer body (lowest
                 memory, recompute-heavy) — the long-standing default
  "dots"         jax.checkpoint_policies.dots_with_no_batch_dims_saveable:
                 keep matmul outputs (the expensive recomputes), recompute
                 the cheap elementwise chain — the classic transformer
                 fine-tune sweet spot
  False / "none" no remat (highest memory, zero recompute)

ModelConfig.remat_encoders accepts any of these (bool or string) and
flows through unchanged; measured numbers in docs/PERFORMANCE.md.
"""

from __future__ import annotations

from typing import Callable, Union

import jax

RematSpec = Union[bool, str]


def apply_remat(body: Callable, remat: RematSpec) -> Callable:
    """Wrap a scan body per the policy spec (see module docstring)."""
    if remat is True or remat == "full":
        return jax.checkpoint(body)
    if remat == "dots":
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    if remat is False or remat == "none" or remat is None:
        return body
    raise ValueError(f"unknown remat policy: {remat!r}")

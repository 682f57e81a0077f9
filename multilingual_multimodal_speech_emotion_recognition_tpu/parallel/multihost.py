"""Multi-host (TPU pod) execution layer.

The reference is strictly single-process / single-device — its only
"distributed" notion is picking cuda vs mps vs cpu (SURVEY.md §5.8). On a
TPU pod (v5e-16 and up) each host process can only address its own 4/8
local chips; one jitted SPMD program spans all of them if and only if
every process (a) runs the identical trace the same number of times and
(b) feeds globally-consistent `jax.Array`s. This module supplies exactly
those pieces, leaving the SPMD program itself untouched — the same
`make_train_step` / `shard_batch` / mesh annotations run single-chip, on
an 8-chip slice, and on a pod:

  initialize()         idempotent `jax.distributed.initialize` wrapper
                       (auto-detects pod metadata; no-op off-pod so
                       single-host runs never pay the handshake).
  HostShardedLoader    per-process view of a GLOBAL bucketed epoch: every
                       process computes the identical batch plan and
                       decodes only its own rows (1/P of the host work),
                       so step counts line up by construction.
  put_sharded()        `device_put` single-process; on a pod assembles the
                       global array from this process's local rows via
                       `jax.make_array_from_process_local_data`.
  local_rows()         this process's rows of a global batch-sharded
                       output, in global row order (inverse of the above).
  allgather_rows()     variable-row-count host allgather, so every process
                       sees the full eval set and computes identical
                       metrics / Weibull fits with no coordinator logic.
  host_replicated()    all-gather mesh-sharded leaves (FSDP/TP) back to a
                       replicated layout so the coordinator can fetch and
                       checkpoint them.

Everything degenerates exactly to the existing single-process path when
`jax.process_count() == 1`; the degeneracies and the plan/row algebra are
tested on the 8-device CPU mesh (tests/test_multihost.py) — two
simulated processes' loaders must partition the global loader's batches
row-for-row.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..data.pipeline import BucketedLoader

#: Environment hints that mean "we are one process of a multi-host job".
#: The coordinator vars cover manual `jax.distributed` launches /
#: megascale; TPU_WORKER_HOSTNAMES counts only when it actually lists
#: MULTIPLE workers — single-host TPU VMs (and relayed dev boxes) set it
#: to one hostname, which must stay single-process.
_POD_ENV_HINTS = (
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def _pod_hinted() -> bool:
    if any(os.environ.get(k) for k in _POD_ENV_HINTS):
        return True
    return "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Bring up the multi-process runtime if this looks like a pod job.

    Must run before the first computation (JAX backends initialize once).
    With no explicit arguments and no pod environment hints this is a
    pure no-op — importantly it does NOT touch the backend, so single-host
    tools keep their lazy platform selection. Returns True iff the
    process is part of a multi-process runtime afterwards.
    """
    explicit = (coordinator_address is not None or num_processes is not None
                or process_id is not None)
    if not explicit and not _pod_hinted():
        return False
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        # already initialized (idempotent re-entry, e.g. two-phase training
        # calling train() twice)
        pass
    except ValueError as e:
        if explicit:
            raise
        # environment hinted at a pod but auto-detection could not resolve
        # the coordinator — stay single-process rather than kill the job
        import warnings
        warnings.warn(f"multi-host auto-detect failed ({e}); "
                      "running single-process")
        return False
    return jax.process_count() > 1


def is_coordinator() -> bool:
    """Process 0 owns all file artifacts: checkpoints, metrics JSONL,
    progress prints. On a shared filesystem the other processes read the
    coordinator's checkpoints back on resume."""
    return jax.process_index() == 0


def put_sharded(x, sharding: NamedSharding):
    """Place one host array onto the mesh under `sharding`.

    Single-process: plain `device_put` (the measured fast path —
    parallel/mesh.py:shard_batch routes every batch leaf through here).
    Multi-process: `x` holds only this process's rows; assemble the global
    array with `jax.make_array_from_process_local_data`, which maps the
    local block onto this process's addressable shards of the global
    batch axis.
    """
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    import jax.numpy as jnp
    return jax.device_put(jnp.asarray(x), sharding)


def local_rows(a) -> np.ndarray:
    """This process's rows of a global batch-sharded array, in global row
    order — exactly the rows its HostShardedLoader fed this step, so they
    pair 1:1 with the loader's host-side batch (labels, example_mask).

    Fully-addressable arrays (single process, or replicated outputs) fetch
    whole. Replicated copies along non-batch mesh axes (tensor-parallel
    replicas hold identical rows) are deduplicated by row offset.
    """
    if getattr(a, "is_fully_addressable", True) or a.is_fully_replicated:
        return np.asarray(a)
    blocks = {}
    for s in a.addressable_shards:
        start = s.index[0].start or 0
        if start not in blocks:
            blocks[start] = np.asarray(s.data)
    return np.concatenate([blocks[k] for k in sorted(blocks)])


def allgather_rows(x: np.ndarray) -> np.ndarray:
    """Concatenate per-process host arrays with DIFFERING row counts
    (eval keeps only unpadded rows, and the last partial batch pads
    unevenly across processes): pad to the max count, one
    `process_allgather`, then strip the padding. Process-major order, so
    every process reconstructs the identical full array — eval metrics,
    temperature fits and Weibull fits come out the same everywhere with
    no cross-host reduction logic. Identity single-process."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils as mhu
    counts = np.asarray(mhu.process_allgather(np.asarray(x.shape[0], np.int64)))
    m = int(counts.max())
    padded = np.zeros((m,) + x.shape[1:], x.dtype)
    padded[: x.shape[0]] = x
    gathered = np.asarray(mhu.process_allgather(padded))  # [P, m, ...]
    return np.concatenate([gathered[p, : int(counts[p])]
                           for p in range(gathered.shape[0])])


def host_replicated(tree):
    """Re-place every mesh-sharded jax leaf (FSDP / tensor-parallel) to a
    fully-replicated layout — one XLA all-gather over ICI per leaf — so a
    single process can fetch it for checkpointing. COLLECTIVE: on a pod
    every process must call this (the coordinator then writes, the rest
    discard — train/checkpoint.py:save_checkpoint does both). Identity
    when single-process or already replicated."""
    if jax.process_count() == 1:
        return tree

    def repl(x):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and not x.is_fully_replicated:
            out = NamedSharding(sh.mesh, P())
            return jax.jit(lambda a: a, out_shardings=out)(x)
        return x

    return jax.tree.map(repl, tree)


class HostShardedLoader(BucketedLoader):
    """Per-process view of a GLOBAL bucketed epoch.

    `batch_size` is the GLOBAL batch size. Every process computes the
    identical global plan (`BucketedLoader._plan` is deterministic in
    (manifest, seed, epoch)), then decodes, tokenizes and assembles ONLY
    global rows [p*Bl, (p+1)*Bl) of each batch (Bl = batch_size /
    process_count) — the rows `put_sharded` maps onto this process's
    addressable shards. Consequences, by construction:

      * every process yields the same number of batches per epoch (the
        SPMD requirement — a mismatched count deadlocks the collectives);
      * each host does 1/P of the decode/DSP/tokenize work;
      * a partial final batch pads per-process blocks independently;
        `example_mask` already carries validity, so eval/loss semantics
        are unchanged.

    `batches_per_epoch` stays the GLOBAL count (the plan length). The
    host-side dicts it yields are local (Bl rows) — pair device outputs
    with them via `local_rows`.
    """

    def __init__(self, dataset, *, batch_size: int,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None, **kw):
        pc = jax.process_count() if process_count is None else process_count
        pi = jax.process_index() if process_index is None else process_index
        if batch_size % pc:
            raise ValueError(f"global batch size {batch_size} not divisible "
                             f"by {pc} processes")
        super().__init__(dataset, batch_size=batch_size, **kw)
        self.process_index, self.process_count = pi, pc
        self.batch_rows = batch_size // pc

    def _plan(self, epoch_idx: int):
        lo = self.process_index * self.batch_rows
        return [(bi, chunk[lo: lo + self.batch_rows])
                for bi, chunk in super()._plan(epoch_idx)]

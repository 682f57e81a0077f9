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
    except RuntimeError as e:
        # Swallow ONLY the idempotent re-entry case (two-phase training
        # calling train() twice). Every other RuntimeError — including
        # XlaRuntimeError subclasses like "coordinator unreachable",
        # "barrier timeout" or "must be called before backends are
        # initialized" — must NOT silently demote an explicitly-requested
        # pod job to single-process: the process would self-elect
        # coordinator (process_index()==0) and write checkpoints/metrics
        # to the shared save_dir while the rest of the pod hangs.
        msg = str(e).lower()
        if not ("already" in msg or "only be called once" in msg
                or "only once" in msg):
            if explicit:
                raise
            # environment merely hinted at a pod: degrade with a warning
            import warnings
            warnings.warn(f"multi-host init failed ({e}); "
                          "running single-process")
            return False
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
    replicas hold identical rows AND identical indices) are deduplicated
    by their full index tuple. Leaves genuinely sharded along non-batch
    axes (e.g. tensor-parallel features [B, D] sharded on 'model') are
    reassembled from this process's column blocks; if the addressable
    shards do not cover full rows (the missing columns live on another
    process) this raises instead of silently returning truncated rows.
    """
    if getattr(a, "is_fully_addressable", True) or a.is_fully_replicated:
        return np.asarray(a)
    # group shards by batch-row offset, dedup replicas by full index
    groups: dict = {}
    for s in a.addressable_shards:
        start = s.index[0].start or 0
        key = tuple(
            (sl.start or 0, dim if sl.stop is None else sl.stop)
            for sl, dim in zip(s.index[1:], a.shape[1:])
        )
        groups.setdefault(start, {}).setdefault(key, s.data)
    row_elems = int(np.prod(a.shape[1:], dtype=np.int64)) if a.ndim > 1 else 1
    out = []
    for start in sorted(groups):
        blocks = groups[start]
        first = np.asarray(next(iter(blocks.values())))
        if len(blocks) == 1 and all(
            lo == 0 and hi == dim
            for (lo, hi), dim in zip(next(iter(blocks)), a.shape[1:])
        ):
            out.append(first)
            continue
        # reassemble column blocks into full rows
        buf = np.zeros((first.shape[0],) + tuple(a.shape[1:]), dtype=first.dtype)
        covered = 0
        for key, data in blocks.items():
            arr = np.asarray(data)
            buf[(slice(None),) + tuple(slice(lo, hi) for lo, hi in key)] = arr
            covered += int(np.prod(arr.shape[1:], dtype=np.int64)) if arr.ndim > 1 else 1
        if covered != row_elems:
            raise ValueError(
                "local_rows: this process's addressable shards cover only "
                f"{covered}/{row_elems} elements per row at offset {start} — "
                "the leaf is sharded along a non-batch axis across processes; "
                "all-gather it (host_replicated) before calling local_rows")
        out.append(buf)
    return np.concatenate(out)


def any_process(flag: bool) -> bool:
    """Pod-wide agreement on a per-process bit: True iff ANY process set
    it. SIGTERM preemption notices land at different step boundaries on
    different hosts; if one process breaks out of the train loop and
    enters checkpointing collectives while the rest still issue train-step
    collectives, the mismatched collective order deadlocks the job exactly
    when time is scarce — so the loop agrees on the flag BEFORE acting
    (train/loop.py polls this each step on pods). COLLECTIVE: every
    process must call it at the same boundary. Identity single-process."""
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils as mhu
    return bool(np.max(mhu.process_allgather(np.asarray(flag, np.int32))))


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

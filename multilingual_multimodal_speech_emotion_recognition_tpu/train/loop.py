"""End-to-end training orchestration.

Reference flow parity (/root/reference/src/train.py:26-263): manifest
datasets, per-group AdamW with warmup-cosine, optional online augmentation,
per-epoch weighted-F1 validation, Weibull fit on val features after the
last epoch, full-state checkpoint per epoch named epoch_{e}_f1_{f1:.4f},
resume support (implemented correctly — the reference's resume references
`scheduler` before creation, train.py:108). Adds the train_crema.py knobs:
grad clipping, early stopping, cosine restarts, seeding.

TPU-native: one jitted train step (augmentation fused in), data-parallel
mesh sharding, metrics JSONL stream.
"""

from __future__ import annotations

import signal
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, to_json
from ..data import pipeline as pipeline_mod
from ..data.pipeline import BucketedLoader, SERDataset
from ..data.tokenizer import Tokenizer, get_tokenizer
from ..models import model as mdl
from ..data.prefetch import device_prefetch
from ..ops import openmax as om
from ..parallel import mesh as mesh_lib
from ..parallel import multihost as mh
from ..utils.metrics import MetricsWriter, weighted_f1
from . import checkpoint as ckpt_lib
from . import optimizer as opt_lib
from . import train_step as ts


class _NullWriter:
    """Metrics sink for non-coordinator pod processes (the coordinator owns
    the JSONL stream; everyone still builds the same record dicts so the
    host-sync cadence stays lockstep across processes)."""

    def write(self, *_a, **_k):
        pass


def evaluate(params, cfg: Config, loader: BucketedLoader, mesh,
             *, collect_features: bool = False, use_openmax: bool = False):
    """Run the eval loop; returns dict with preds/labels/logits (+features)."""
    step = ts.make_eval_step(cfg.model, use_openmax=use_openmax)
    logits_all, labels_all, feats_all = [], [], []

    def put(b):
        return mesh_lib.shard_batch(
            {k: v for k, v in b.items()
             if k not in pipeline_mod.EVAL_HOST_KEYS}, mesh)

    # Pod jobs: device outputs are GLOBAL arrays but the host batch holds
    # only this process's rows — pair them via local_rows, then allgather
    # at the end so every process computes identical metrics/Weibull fits.
    pc = jax.process_count()
    fetch = (mh.local_rows if pc > 1 else np.asarray)
    for dev_batch, batch in device_prefetch(loader.epoch(0), put):
        logits, feats, _ = step(params, dev_batch)
        keep = batch["example_mask"] > 0
        logits_all.append(fetch(logits)[keep])
        labels_all.append(batch["labels"][keep])
        if collect_features:
            feats_all.append(fetch(feats)[keep])
    logits = np.concatenate(logits_all) if logits_all else np.zeros((0, cfg.model.num_labels))
    labels = np.concatenate(labels_all) if labels_all else np.zeros((0,), np.int32)
    if pc > 1:
        logits = mh.allgather_rows(logits)
        labels = mh.allgather_rows(labels)
    out = {"logits": logits, "labels": labels,
           "preds": logits.argmax(-1) if len(logits) else np.zeros((0,), np.int64)}
    if collect_features:
        f = np.concatenate(feats_all) if feats_all else None
        if pc > 1 and f is not None:
            f = mh.allgather_rows(f)
        out["features"] = f
    return out


class PreemptionGuard:
    """Preemption-safe shutdown for spot/preemptible TPU VMs.

    Installs a SIGTERM handler (the signal cloud schedulers send ahead of
    reclaim) that only sets a flag; the train loop polls it at step
    boundaries and writes a resumable checkpoint before exiting — no state
    is ever torn down mid-update. The reference has no notion of this
    (its only failure handling is zeros-on-decode-error and skip-batch,
    SURVEY.md §5.3); on TPU pools preemption is routine, so this is part
    of the runtime layer. No-ops safely off the main thread."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = signals
        self._prev = {}
        self.triggered = False

    def _handler(self, signum, frame):
        self.triggered = True

    def __enter__(self):
        for s in self._signals:
            try:
                self._prev[s] = signal.signal(s, self._handler)
            except ValueError:      # not the main thread: poll-only mode
                pass
        return self

    def __exit__(self, *exc):
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        self._prev = {}          # idempotent: safe to call from any exit path
        return False


def train(cfg: Config, *, train_manifest: str, val_manifest: str,
          tokenizer: Optional[Tokenizer] = None,
          pretrained: Optional[Dict] = None,
          initial_params: Optional[Dict] = None,
          mesh=None, log_path: Optional[str] = None,
          progress: bool = True,
          guard: Optional[PreemptionGuard] = None) -> Dict:
    tcfg = cfg.train
    tok = tokenizer or get_tokenizer(vocab_size=cfg.model.text.vocab_size)
    mesh = mesh or mesh_lib.mesh_from_config(cfg.mesh)
    # Pod jobs: the coordinator owns every file artifact and all prints;
    # tcfg.batch_size is the GLOBAL batch, each process decoding 1/P of it.
    pod = jax.process_count() > 1
    coord = mh.is_coordinator()
    progress = progress and coord
    writer = MetricsWriter(
        log_path or str(Path(tcfg.save_dir) / "metrics.jsonl")) if coord \
        else _NullWriter()
    Loader = mh.HostShardedLoader if pod else BucketedLoader

    train_ds = SERDataset(train_manifest, cfg.data)
    val_ds = SERDataset(val_manifest, cfg.data)
    train_loader = Loader(train_ds, batch_size=tcfg.batch_size,
                          tokenizer=tok, shuffle=True, seed=tcfg.seed,
                          drop_remainder=True)
    val_loader = Loader(val_ds, batch_size=tcfg.batch_size,
                        tokenizer=tok, shuffle=False, seed=0)

    key = jax.random.key(tcfg.seed)
    k_init, key = jax.random.split(key)
    if initial_params is not None:
        params = initial_params
    else:
        params = mdl.init_model(k_init, cfg.model)
        if pretrained:
            params = mdl.load_pretrained_backbones(params, **pretrained)
    params = mesh_lib.shard_params(params, mesh, fsdp=cfg.mesh.fsdp,
                                   fsdp_min_size=cfg.mesh.fsdp_min_size)

    steps_per_epoch = max(1, train_loader.batches_per_epoch())
    total_steps = steps_per_epoch * tcfg.epochs
    tx = opt_lib.make_train_optimizer(
        params, lr=tcfg.lr, total_steps=total_steps,
        warmup_ratio=tcfg.warmup_ratio, scheduler=tcfg.scheduler,
        restart_steps=steps_per_epoch * tcfg.restart_period_epochs,
        freeze_backbones=tcfg.freeze_backbones,
        grad_clip=tcfg.grad_clip,
        backbone_moment_dtype=(jnp.dtype(tcfg.backbone_moment_dtype)
                               if tcfg.backbone_moment_dtype else None))
    opt_state = tx.init(params)

    start_epoch, global_step = 0, 0
    if tcfg.resume_from:
        params, opt_state_r, meta = ckpt_lib.restore_checkpoint(
            tcfg.resume_from, params_template=params,
            opt_state_template=opt_state)
        params = mesh_lib.shard_params(params, mesh, fsdp=cfg.mesh.fsdp,
                                       fsdp_min_size=cfg.mesh.fsdp_min_size)
        if opt_state_r is not None:
            # restored moments come back as host arrays: re-place any leaf
            # whose fresh layout (tx.init on the sharded params) is a mesh
            # sharding, so FSDP/TP resume keeps moments sharded instead of
            # replicated. Leaves with single-device layouts (step counters)
            # stay uncommitted — committing them to one device would
            # conflict with the mesh-committed params under jit.
            from jax.sharding import NamedSharding
            opt_state = jax.tree.map(
                lambda r, t: jax.device_put(r, t.sharding)
                if isinstance(getattr(t, "sharding", None), NamedSharding)
                else r, opt_state_r, opt_state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        global_step = int(meta.get("step", 0))
        if progress:
            print(f"Resumed from {tcfg.resume_from} at epoch {start_epoch}")

    step_fn = ts.make_train_step(cfg.model, tcfg, tx, donate=True)

    def fit_weibull_into(p):
        """Weibull fit on val penultimate features (train.py:204-245),
        stamped into the classifier params. Returns p unchanged when the
        val set is empty."""
        ev_f = evaluate(p, cfg, val_loader, mesh, collect_features=True)
        if ev_f["features"] is None or not len(ev_f["features"]):
            return p
        weibull = om.fit_weibull(jnp.asarray(ev_f["features"]),
                                 jnp.asarray(ev_f["labels"]),
                                 cfg.model.num_labels)
        p = dict(p)
        p["classifier"] = dict(p["classifier"])
        p["classifier"]["weibull"] = jax.tree.map(jax.device_put, weibull)
        return p

    best_f1, best_epoch, history = -1.0, -1, []
    best_path: Optional[Path] = None
    last_path: Optional[Path] = None
    last_meta: Dict = {}
    save_root = Path(tcfg.save_dir)
    f1 = 0.0
    guard = guard or PreemptionGuard()
    guard.__enter__()
    try:
        for epoch in range(start_epoch, tcfg.epochs):
            t0 = time.time()
            losses = []          # device scalars: loss sync deferred to log steps
            t_window, n_window = time.time(), 0

            def put_train(b):
                return mesh_lib.shard_batch(
                    {k: v for k, v in b.items()
                     if k not in pipeline_mod.TRAIN_HOST_KEYS}, mesh)

            # device transfer of batch N+1 overlaps step N (data/prefetch.py)
            for dev_batch, batch in device_prefetch(train_loader.epoch(epoch),
                                                    put_train):
                key, k_step = jax.random.split(key)
                params, opt_state, metrics = step_fn(params, opt_state, dev_batch, k_step)
                global_step += 1
                n_window += 1
                if pod:
                    # agree on the preemption bit BEFORE acting: one host
                    # breaking into checkpoint collectives while others
                    # still issue train-step collectives would deadlock.
                    # One scalar allgather per step (~negligible vs a step).
                    if mh.any_process(guard.triggered):
                        guard.triggered = True   # propagate to all processes
                        break
                elif guard.triggered:
                    break
                losses.append(metrics.loss)  # no host sync: keep device pipelined
                if global_step % 50 == 0:
                    # the float() here is the only host sync in the window
                    now = time.time()
                    writer.write({"kind": "step", "step": global_step,
                                  "epoch": epoch, "loss": float(metrics.loss),
                                  "ce": float(metrics.ce),
                                  "focal": float(metrics.focal),
                                  "accuracy": float(metrics.accuracy),
                                  "utt_per_sec": n_window * tcfg.batch_size
                                  / max(now - t_window, 1e-9)})
                    t_window, n_window = time.time(), 0
                    if progress:
                        print(f"epoch {epoch} step {global_step} "
                              f"loss {float(metrics.loss):.4f}")
            if guard.triggered:
                # Preempted: write a resumable checkpoint at the last completed
                # step and exit. epoch-1 in the meta makes --resume_from restart
                # the interrupted epoch (step count and optimizer state carry
                # through, so the LR schedule continues where it stopped).
                pre_path = save_root / f"preempt_step_{global_step}"
                ckpt_lib.save_checkpoint(
                    pre_path, params=params, opt_state=opt_state,
                    step=global_step, epoch=epoch - 1, f1=max(best_f1, 0.0),
                    config_json=to_json(cfg), dedup_frozen=tcfg.freeze_backbones,
                    frozen_store=save_root / "frozen_store")
                writer.write({"kind": "preempt", "step": global_step,
                              "epoch": epoch, "checkpoint": str(pre_path)})
                if progress:
                    print(f"Preemption signal: saved {pre_path} at step "
                          f"{global_step}, exiting")
                last_path = pre_path
                break

            train_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0

            ev = evaluate(params, cfg, val_loader, mesh)
            f1 = weighted_f1(ev["preds"], ev["labels"], cfg.model.num_labels)
            dt = time.time() - t0
            history.append({"epoch": epoch, "train_loss": train_loss, "val_f1": f1,
                            "seconds": dt})
            writer.write({"kind": "epoch", **history[-1], "step": global_step})
            if progress:
                print(f"Epoch {epoch} F1: {f1:.4f} (loss {train_loss:.4f}, {dt:.1f}s)")

            last_path = save_root / f"epoch_{epoch}_f1_{f1:.4f}"
            last_meta = {"step": global_step, "epoch": epoch, "f1": f1}
            ckpt_lib.save_checkpoint(
                last_path, params=params, opt_state=opt_state, **last_meta,
                config_json=to_json(cfg), dedup_frozen=tcfg.freeze_backbones,
                frozen_store=save_root / "frozen_store")

            if f1 > best_f1:
                best_f1, best_epoch, best_path = f1, epoch, last_path
            elif (tcfg.early_stop_patience is not None
                  and epoch - best_epoch >= tcfg.early_stop_patience):
                if progress:
                    print(f"Early stopping at epoch {epoch} (best {best_f1:.4f} "
                          f"@ {best_epoch})")
                break

    finally:
        # exception-safe: never leak the SIGTERM handler if the
        # loop raises (checkpoint IO error, eval failure, Ctrl-C)
        guard.__exit__()
    if guard.triggered:
        # fast exit on preemption — no val pass; the Weibull fit happens on
        # the resumed run's natural loop exit
        return {"params": params, "opt_state": opt_state, "history": history,
                "best_f1": best_f1, "final_f1": f1, "mesh": mesh,
                "preempted": True, "checkpoint": str(last_path)}

    # Weibull fit ALWAYS runs on loop exit — after the last *executed* epoch
    # (reference src/train.py:204-245), which under early stopping or a
    # resume-shortened run is not epochs-1. Both the final and the best-F1
    # checkpoints must carry a real fit, or OpenMax at inference degrades to
    # scaling every input's logits (zero activation vectors, tau=0).
    params = fit_weibull_into(params)
    if last_path is not None:
        ckpt_lib.save_checkpoint(last_path, params=params,
                                 opt_state=opt_state, **last_meta,
                                 config_json=to_json(cfg),
                                 dedup_frozen=tcfg.freeze_backbones,
                                 frozen_store=save_root / "frozen_store")
    if best_path is not None and best_path != last_path:
        b_params, b_opt, b_meta = ckpt_lib.restore_checkpoint(
            best_path, params_template=params, opt_state_template=opt_state)
        b_params = fit_weibull_into(
            mesh_lib.shard_params(b_params, mesh, fsdp=cfg.mesh.fsdp,
                                  fsdp_min_size=cfg.mesh.fsdp_min_size))
        ckpt_lib.save_checkpoint(
            best_path, params=b_params, opt_state=b_opt,
            step=int(b_meta.get("step", 0)), epoch=int(b_meta.get("epoch", 0)),
            f1=float(b_meta.get("f1", 0.0)), config_json=to_json(cfg),
            dedup_frozen=tcfg.freeze_backbones,
            frozen_store=save_root / "frozen_store")

    return {"params": params, "opt_state": opt_state, "history": history,
            "best_f1": best_f1, "final_f1": f1, "mesh": mesh,
            "preempted": False}


def phase2_grad_accum(batch_size: int, grad_accum: int,
                      max_microbatch: int = 64) -> int:
    """Smallest grad_accum >= the configured one that divides batch_size
    and keeps the UNFROZEN microbatch <= max_microbatch.

    The unfrozen flagship step OOMs the v5e at a monolithic microbatch of
    128 but runs at microbatch 64; splitting an effective B=128 into two
    lax.scan microbatches measured 323 utt/s vs the monolithic B=64
    knee's 303 (docs/PERFORMANCE.md, round 5) — so phase 2 auto-raises
    accumulation instead of inheriting phase 1's (frozen, memory-cheap)
    monolithic batch and dying."""
    accum = max(grad_accum, -(-batch_size // max_microbatch))
    while batch_size % accum:
        accum += 1
    return accum


def train_two_phase(cfg: Config, *, train_manifest: str, val_manifest: str,
                    phase1_epochs: int = 3, phase2_epochs: int = 2,
                    phase1_lr: float = 5e-4, phase2_lr: float = 1e-5,
                    tokenizer: Optional[Tokenizer] = None,
                    pretrained: Optional[Dict] = None,
                    mesh=None, progress: bool = True) -> Dict:
    """Two-phase protocol (reference src/train_two_phase.py:34-441 intent —
    that script is not runnable as-is, SURVEY.md §7): phase 1 trains heads
    with frozen encoder backbones at phase1_lr; phase 2 unfreezes the
    backbones and fine-tunes everything at phase2_lr. Each phase writes its
    own checkpoints under save_dir/phase{1,2}. Phase 2 auto-raises
    grad_accum to bound the unfrozen microbatch (phase2_grad_accum);
    gradient accumulation is exactness-tested vs the monolithic batch, so
    this changes memory and speed, not numerics."""
    import dataclasses as dc
    base = Path(cfg.train.save_dir)
    cfg1 = dc.replace(cfg, train=dc.replace(
        cfg.train, epochs=phase1_epochs, lr=phase1_lr,
        freeze_backbones=True, save_dir=str(base / "phase1")))
    r1 = train(cfg1, train_manifest=train_manifest, val_manifest=val_manifest,
               tokenizer=tokenizer, pretrained=pretrained, mesh=mesh,
               progress=progress)
    cfg2 = dc.replace(cfg, train=dc.replace(
        cfg.train, epochs=phase2_epochs, lr=phase2_lr,
        freeze_backbones=False, save_dir=str(base / "phase2"),
        grad_accum=phase2_grad_accum(cfg.train.batch_size,
                                     cfg.train.grad_accum)))
    # copy: the phase-2 train step donates its input buffers, and phase-1's
    # returned params must stay readable by the caller
    phase2_init = jax.tree.map(lambda x: x.copy(), r1["params"])
    r2 = train(cfg2, train_manifest=train_manifest, val_manifest=val_manifest,
               tokenizer=tokenizer, initial_params=phase2_init,
               mesh=mesh or r1["mesh"], progress=progress)
    return {"phase1": r1, "phase2": r2, "params": r2["params"],
            "best_f1": max(r1["best_f1"], r2["best_f1"])}

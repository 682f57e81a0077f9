"""Checkpoint save/restore.

TPU-native replacement for the reference's flat torch.save dict of 8 module
state_dicts + optimizer + scheduler + epoch + f1
(/root/reference/src/train.py:247-263): a single pytree {params, opt_state,
step, epoch, f1, config_json} written with orbax (async-capable, atomic),
with a numpy .npz fallback so checkpoints remain readable anywhere.

Retention policies mirror the reference variants: per-epoch (train.py:263),
best-F1 + periodic (train_crema.py:459-505).
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy_tree(tree):
    # start every device->host copy asynchronously BEFORE blocking on any of
    # them: a serial per-leaf fetch pays one link round trip per leaf, which
    # on a relayed backend (axon tunnel) turns a ~700-leaf backbone tree
    # into tens of minutes; overlapped it is bounded by link bandwidth.
    leaves, treedef = jax.tree.flatten(tree)
    for x in leaves:
        if isinstance(x, jax.Array):
            try:
                x.copy_to_host_async()
            except Exception:
                pass
    return jax.tree.unflatten(treedef, [np.asarray(x) for x in leaves])


# top-level param subtrees that never change under freeze_backbones=True
# (train_step stop_gradients them and the optimizer set_to_zeros them)
FROZEN_SUBTREES = ("audio_backbone", "text_backbone")


def _frozen_fingerprint(frozen_tree) -> str:
    """Cheap but content-sensitive fingerprint of the frozen subtrees.

    Hashes (a) every leaf's key path + shape + dtype and (b) an exact
    content probe: the first/last 4 elements of each leaf, gathered into
    ONE device array and fetched in a single small transfer (a full-tree
    host fetch is ~9 min over the axon link; this is milliseconds).
    Element sampling is exact bytes — no reduction-order sensitivity — so
    the same weights fingerprint identically on CPU and TPU, while any
    different pretrained checkpoint or backbone preset diverges in the
    probe (or in the shape/dtype census) with overwhelming probability.
    """
    import hashlib

    import jax.numpy as jnp

    leaves = jax.tree_util.tree_flatten_with_path(frozen_tree)[0]
    desc = [(list(_path_strs(p)), [int(d) for d in jnp.shape(x)],
             str(jnp.result_type(x))) for p, x in leaves]
    probes = []
    for _, x in leaves:
        flat = jnp.ravel(jnp.asarray(x, jnp.float32))
        probes.append(flat[:4])
        probes.append(flat[-4:])
    probe = np.asarray(jnp.concatenate(probes)) if probes else np.zeros(0)
    h = hashlib.sha256()
    h.update(json.dumps(desc, sort_keys=True).encode())
    h.update(probe.astype("<f4").tobytes())
    return h.hexdigest()


def _write_state(prefix: Path, state: dict) -> None:
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(prefix.absolute(), state, force=True)
        ckptr.wait_until_finished()
    except Exception:
        with open(prefix.parent / (prefix.name + ".pkl"), "wb") as f:
            pickle.dump(state, f)


def _read_state(prefix: Path, template=None):
    pkl = prefix.parent / (prefix.name + ".pkl")
    if pkl.exists():
        with open(pkl, "rb") as f:
            return pickle.load(f)
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(prefix.absolute(), template)
    return ckptr.restore(prefix.absolute())


def save_checkpoint(path: str | Path, *, params, opt_state=None, step: int = 0,
                    epoch: int = 0, f1: float = 0.0,
                    config_json: Optional[str] = None,
                    extra: Optional[Dict[str, Any]] = None,
                    dedup_frozen: bool = False,
                    frozen_store: Optional[str | Path] = None) -> Path:
    """Write a checkpoint directory. Uses orbax if available, else pickle of
    numpy-ified pytrees (both layouts carry the same 'meta.json').

    dedup_frozen: with frozen backbones (the reference's standard setup and
    ours, TrainConfig.freeze_backbones), ~95% of checkpoint bytes are the
    never-changing backbone subtrees the reference still re-serializes
    every epoch (train.py:247-263). Here they are written ONCE to a shared
    `frozen_store` sibling directory and each checkpoint stores only the
    trainable params + a `frozen_ref.json`; restore_checkpoint merges
    transparently, so readers are unchanged. Per-epoch checkpoint IO drops
    from ~1.5 GB to ~30 MB at flagship scale.

    Multi-host (pod) jobs: EVERY process must call this — the leading
    host_replicated() is a collective that all-gathers FSDP/TP-sharded
    leaves back to a fetchable layout — but only the coordinator writes
    files (the rest return immediately after the collective). On resume,
    processes read the coordinator's files from the shared filesystem."""
    if jax.process_count() > 1:
        from ..parallel import multihost as mh
        params = mh.host_replicated(params)
        if opt_state is not None:
            opt_state = mh.host_replicated(opt_state)
        if not mh.is_coordinator():
            return Path(path)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    meta = {"step": int(step), "epoch": int(epoch), "f1": float(f1)}
    if extra:
        meta.update(extra)
    (path / "meta.json").write_text(json.dumps(meta))
    if config_json is not None:
        (path / "config.json").write_text(config_json)

    to_save = params
    if dedup_frozen:
        frozen = {k: params[k] for k in FROZEN_SUBTREES if k in params}
        if frozen:
            store = Path(frozen_store) if frozen_store is not None \
                else path.parent / "frozen_store"
            fp = _frozen_fingerprint(frozen)
            done = store / "DONE"
            if not done.exists():
                store.mkdir(parents=True, exist_ok=True)
                _write_state(store / "state",
                             {"params": _to_numpy_tree(frozen)})
                done.write_text(json.dumps({"fingerprint": fp}))
            else:
                # Never silently reuse a store written for different frozen
                # weights (e.g. re-running into the same save_dir with a
                # different --audio_backbone): restore would then merge the
                # WRONG backbone into every checkpoint with no error.
                try:
                    stored = json.loads(done.read_text()).get("fingerprint")
                except (json.JSONDecodeError, AttributeError, OSError):
                    stored = None
                if stored is None:
                    # Legacy DONE marker (pre-fingerprint, literal "ok"):
                    # verify by content — fingerprint the stored weights
                    # themselves — and migrate the marker, instead of
                    # aborting a resume into an older save_dir.
                    stored = _frozen_fingerprint(
                        _read_state(store / "state")["params"])
                    if stored == fp:
                        done.write_text(json.dumps({"fingerprint": fp}))
                if stored != fp:
                    raise ValueError(
                        f"frozen_store at {store} was written for different "
                        "frozen backbone weights (fingerprint mismatch: "
                        f"stored={stored!r} current={fp[:16]}...). Delete the "
                        "store or use a fresh save_dir/frozen_store.")
            import os
            (path / "frozen_ref.json").write_text(json.dumps({
                "store": os.path.relpath(store, path),
                "keys": sorted(frozen)}))
            to_save = {k: v for k, v in params.items() if k not in frozen}

    state = {"params": _to_numpy_tree(to_save)}
    if opt_state is not None:
        state["opt_state"] = _to_numpy_tree(opt_state)
    _write_state(path / "state", state)
    return path


def _identity_feature_proj(d: int) -> dict:
    """Exact-identity d->32->d projection: lin1 stacks [I, -I] columns, ReLU
    splits the positive/negative parts, lin2 recombines them — output == x
    for every real input (needs 2d <= 32, true for d in {8, 12})."""
    k1 = np.zeros((d, 32), np.float32)
    k2 = np.zeros((32, d), np.float32)
    k1[:, :d] = np.eye(d)
    k1[:, d:2 * d] = -np.eye(d)
    k2[:d, :] = np.eye(d)
    k2[d:2 * d, :] = -np.eye(d)
    return {"lin1": {"kernel": k1, "bias": np.zeros(32, np.float32)},
            "lin2": {"kernel": k2, "bias": np.zeros(d, np.float32)}}


def _fill_legacy_projections(params: dict) -> list:
    """Back-compat for checkpoints saved before the learned front-end
    feature projections (models/model.py quality_proj/cond_proj/asr_proj)
    existed: fill the missing slots with EXACT identity projections, so the
    restored model computes precisely what it was trained to compute. Which
    slots are expected is inferred the same way init_model decides them —
    from the fusion blocks the checkpoint does carry."""
    filled = []
    if "asr_fusion" in params and "asr_proj" not in params:
        params["asr_proj"] = _identity_feature_proj(8)
        filled.append("asr_proj")
    has_q = "combined_fusion" in params or "quality_fusion" in params
    has_c = "combined_fusion" in params or "conditioning_fusion" in params
    if has_q and "quality_proj" not in params:
        params["quality_proj"] = _identity_feature_proj(8)
        filled.append("quality_proj")
    if has_c and "cond_proj" not in params:
        params["cond_proj"] = _identity_feature_proj(12)
        filled.append("cond_proj")
    return filled


def restore_checkpoint(path: str | Path, *, params_template=None,
                       opt_state_template=None):
    """Returns (params, opt_state_or_None, meta_dict). Templates restore
    exact pytree structure (required for optax namedtuple states).

    Pre-projection-era checkpoints restore transparently: the missing
    projection slots are filled with identity projections (function-
    preserving) and any restored optimizer moments are dropped (they lack
    entries for the new slots), so resume warm-starts those leaves."""
    path = Path(path)
    meta = json.loads((path / "meta.json").read_text()) if (path / "meta.json").exists() else {}

    frozen_ref = None
    if (path / "frozen_ref.json").exists():
        frozen_ref = json.loads((path / "frozen_ref.json").read_text())

    p_template = params_template
    if frozen_ref is not None and p_template is not None:
        p_template = {k: v for k, v in p_template.items()
                      if k not in frozen_ref["keys"]}

    template = None
    if p_template is not None:
        template = {"params": _to_numpy_tree(p_template)}
        if opt_state_template is not None:
            template["opt_state"] = _to_numpy_tree(opt_state_template)
    try:
        state = _read_state(path / "state", template)
    except Exception:
        if template is None:
            raise
        # A legacy checkpoint's tree lacks leaves the template expects —
        # retry structure-free; _fill_legacy_projections below migrates the
        # known-missing slots, anything else still fails downstream.
        state = _read_state(path / "state")
        if not isinstance(state, dict) or "params" not in state or not any(
                k not in state["params"] for k in template["params"]):
            raise

    params = state["params"]
    if frozen_ref is not None:
        store = (path / frozen_ref["store"]).resolve()
        f_template = None
        if params_template is not None:
            f_template = {"params": _to_numpy_tree(
                {k: params_template[k] for k in frozen_ref["keys"]
                 if k in params_template})}
        frozen = _read_state(store / "state", f_template)["params"]
        params = {**params, **frozen}
    filled = _fill_legacy_projections(params)
    opt_state = state.get("opt_state")
    if filled:
        print(f"restore_checkpoint: legacy checkpoint migrated — filled "
              f"{filled} with identity feature projections"
              + ("; dropping restored optimizer moments (no entries for the "
                 "new slots)" if opt_state is not None else ""))
        opt_state = None
    if opt_state is not None and opt_state_template is not None:
        # Restored trees may be plain dicts/lists (orbax serializes optax
        # namedtuples structurally); rebuild the optax structure only when
        # the flattened KEY PATHS provably line up — leaf-count coincidence
        # is not evidence of matching structure.
        tdef = jax.tree.structure(opt_state_template)
        if jax.tree.structure(opt_state) != tdef:
            r_map = {_path_strs(p): leaf for p, leaf in
                     jax.tree_util.tree_flatten_with_path(opt_state)[0]}
            t_paths = [_path_strs(p) for p, _ in
                       jax.tree_util.tree_flatten_with_path(opt_state_template)[0]]
            if len(r_map) == len(t_paths) and set(r_map) == set(t_paths):
                # match leaves BY KEY PATH (dicts flatten sorted, namedtuples
                # in field order — order alone proves nothing)
                opt_state = jax.tree.unflatten(tdef, [r_map[p] for p in t_paths])
            else:
                missing = sorted(set(t_paths) - set(r_map))[:3]
                raise ValueError(
                    "restored opt_state key paths do not match the optimizer "
                    "template — refusing to reassign optimizer moments "
                    f"(restored {len(r_map)} leaves, template {len(t_paths)}, "
                    f"first missing: {missing})")
    return params, opt_state, meta


def _path_strs(path) -> tuple:
    """Normalize a jax key path so namedtuple fields, dict keys, and sequence
    indexes compare equal across serialized representations (a namedtuple
    restored as {'0': ..., 'mu': ...} must match GetAttrKey('mu') etc.)."""
    out = []
    for k in path:
        for attr in ("name", "key", "idx"):
            if hasattr(k, attr):
                out.append(str(getattr(k, attr)))
                break
        else:
            out.append(str(k))
    return tuple(out)


def load_config_json(path: str | Path) -> Optional[str]:
    p = Path(path) / "config.json"
    return p.read_text() if p.exists() else None


def best_checkpoint(save_dir: str | Path) -> Optional[Path]:
    """Highest-F1 checkpoint directory under save_dir."""
    best, best_f1 = None, -1.0
    for meta in Path(save_dir).glob("*/meta.json"):
        try:
            f1 = json.loads(meta.read_text()).get("f1", -1.0)
        except Exception:
            continue
        if f1 > best_f1:
            best, best_f1 = meta.parent, f1
    return best

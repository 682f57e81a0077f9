"""AOT model export for serving (jax.export / StableHLO).

The reference has no deployment story — its entry points are research
scripts that rebuild eight nn.Modules from a checkpoint every run
(/root/reference/src/interface.py:23-123). Here the flagship forward is
packaged as a serialized StableHLO program plus its parameter pytree: a
serving process deserializes the program and runs it without tracing,
model code, or transformers on the hot path — the TPU-native equivalent
of a saved-model artifact.

Artifacts are per-shape (fixed-shape bucketed serving, like the data
pipeline) and per-platform (StableHLO is lowered with platform checks;
export on the deploy platform). Layout on disk:

    <dir>/program.bin    jax.export serialization of fn(params, batch)
    <dir>/params.npz     flat parameter arrays (path-keyed)
    <dir>/spec.json      batch spec + config JSON + output names
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from .config import ModelConfig
from .data import bucketing

OUTPUTS = ("logits", "uncertainty", "features")


def _flatten_params(params) -> Dict[str, np.ndarray]:
    import jax
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {}
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        if key in out:
            raise ValueError(f"duplicate param key path {key!r}")
        out[key] = np.asarray(leaf)
    return out


def _skeletonize(node) -> Dict:
    """Explicit JSON skeleton of the param pytree: dict/list structure with
    npz key names at the leaves. Persisted in spec.json so ServingModel can
    rebuild the tree by walking it — no string-parsing of keystr output
    (which silently mis-parsed any future key containing brackets/quotes)."""
    import jax

    def walk(n, path):
        if isinstance(n, dict):
            return {"kind": "dict",
                    "items": {str(k): walk(v, path + (jax.tree_util.DictKey(k),))
                              for k, v in n.items()}}
        if isinstance(n, (list, tuple)):
            return {"kind": "list" if isinstance(n, list) else "tuple",
                    "items": [walk(v, path + (jax.tree_util.SequenceKey(i),))
                              for i, v in enumerate(n)]}
        return {"kind": "leaf", "key": jax.tree_util.keystr(path)}

    return walk(node, ())


def _rebuild_from_skeleton(skel: Dict, arrays: Dict[str, np.ndarray]):
    import jax.numpy as jnp
    kind = skel["kind"]
    if kind == "dict":
        return {k: _rebuild_from_skeleton(v, arrays)
                for k, v in skel["items"].items()}
    if kind in ("list", "tuple"):
        seq = [_rebuild_from_skeleton(v, arrays) for v in skel["items"]]
        return seq if kind == "list" else tuple(seq)
    return jnp.asarray(arrays[skel["key"]])


def _batch_spec(batch_size: int, audio_samples: int, text_tokens: int,
                with_dsp: bool, wire: str = "f32"
                ) -> Dict[str, Tuple[tuple, str]]:
    if wire == "int16":
        # Wire-compact input: audio ships as int16 PCM and the [B,T] mask
        # as per-row lengths — ~4x fewer host->device bytes than
        # f32 audio + f32 mask (2·B·T+4·B vs 8·B·T). Bit-exact for PCM
        # sources (the HTTP b64 path IS int16); f32 sources quantize at
        # ~3e-5, below the front-end's own noise floor. Mirrors the
        # training pipeline's wire compaction (parallel/mesh.py).
        spec = {
            "audio": ((batch_size, audio_samples), "int16"),
            "audio_len": ((batch_size,), "int32"),
        }
    elif wire == "f32":
        spec = {
            "audio": ((batch_size, audio_samples), "float32"),
            "audio_mask": ((batch_size, audio_samples), "float32"),
        }
    else:
        raise ValueError(f"wire must be 'f32' or 'int16', got {wire!r}")
    spec.update({
        "text_ids": ((batch_size, text_tokens), "int32"),
        "text_mask": ((batch_size, text_tokens), "float32"),
    })
    if with_dsp:
        spec["lid_entropy"] = ((batch_size,), "float32")
        spec["lid_conf"] = ((batch_size,), "float32")
    else:
        spec["quality_feats"] = ((batch_size, 8), "float32")
        spec["cond_feats"] = ((batch_size, 12), "float32")
    return spec


def export_forward(params, cfg: ModelConfig, out_dir: str | Path, *,
                   batch_size: int = 32, audio_seconds: float = 4.0,
                   text_tokens: int = 32, sample_rate: int = 16000,
                   with_dsp: bool = True, use_openmax: bool = True,
                   wire: str = "f32",
                   config_json: Optional[str] = None) -> Path:
    """Serialize the fused forward (optionally including the device DSP
    front-end) for one serving shape. Returns the artifact directory.

    wire="int16" exports a wire-compact program whose audio input is raw
    int16 PCM plus per-row lengths; dequantization (x/32768) and mask
    materialization happen on device (see _batch_spec)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexp
    from .models import model as mdl

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    T = bucketing.seconds_to_samples(audio_seconds, sample_rate)
    spec = _batch_spec(batch_size, T, text_tokens, with_dsp, wire)

    # store the artifact in f32 (npz has no bfloat16); model_forward casts
    # to cfg.compute_dtype internally, so serving numerics are unchanged
    params = mdl.cast_floating(params, jnp.float32)

    def fn(p, batch):
        if "audio_len" in batch:  # int16 wire: dequantize + build mask
            mask = (jnp.arange(T, dtype=jnp.int32)[None, :]
                    < batch["audio_len"][:, None]).astype(jnp.float32)
            batch = dict(batch,
                         audio=batch["audio"].astype(jnp.float32)
                         * (mask / 32768.0))
            batch["audio_mask"] = mask
            del batch["audio_len"]
        o = mdl.model_forward(p, cfg, batch, deterministic=True,
                              use_openmax=use_openmax)
        return (o.logits.astype(jnp.float32),
                o.uncertainty.astype(jnp.float32),
                o.features.astype(jnp.float32))

    p_struct = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
    b_struct = {k: jax.ShapeDtypeStruct(shape, dtype)
                for k, (shape, dtype) in spec.items()}
    exp = jexp.export(jax.jit(fn))(p_struct, b_struct)
    (out / "program.bin").write_bytes(exp.serialize())

    np.savez(out / "params.npz", **_flatten_params(params))
    (out / "spec.json").write_text(json.dumps({
        "batch_spec": {k: [list(s), d] for k, (s, d) in spec.items()},
        "outputs": list(OUTPUTS),
        "with_dsp": with_dsp,
        "use_openmax": use_openmax,
        "wire": wire,
        "sample_rate": int(sample_rate),  # serving resamples requests to this
        "platforms": list(exp.platforms),
        "config_json": config_json,
        # recorded so serving can fail fast on a tokenizer/artifact
        # mismatch (OOB token ids gather NaN embeddings under jit)
        "text_vocab_size": int(cfg.text.vocab_size),
        "num_labels": int(cfg.num_labels),
        "params_tree": _skeletonize(params),
    }))
    return out


def export_buckets(params, cfg: ModelConfig, out_dir: str | Path, *,
                   buckets, text_tokens: int = 32, sample_rate: int = 16000,
                   with_dsp: bool = True, use_openmax: bool = True,
                   wire: str = "f32",
                   config_json: Optional[str] = None) -> Path:
    """One CLI call -> one artifact per audio bucket (the serving-side
    mirror of the data pipeline's fixed-shape bucketing). `buckets` is a
    sequence of (audio_seconds, batch_size) pairs; artifacts land in
    `<out_dir>/b<sec>s_bs<batch>/` with a top-level `index.json` a router
    can use to pick the bucket for an incoming clip length."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    index = []
    for audio_seconds, batch_size in buckets:
        name = f"b{audio_seconds:g}s_bs{batch_size}"
        export_forward(params, cfg, out / name, batch_size=batch_size,
                       audio_seconds=float(audio_seconds),
                       text_tokens=text_tokens, sample_rate=sample_rate,
                       with_dsp=with_dsp, use_openmax=use_openmax,
                       wire=wire, config_json=config_json)
        index.append({"dir": name, "audio_seconds": float(audio_seconds),
                      "audio_samples": bucketing.seconds_to_samples(
                          audio_seconds, sample_rate),
                      "batch_size": int(batch_size)})
    index.sort(key=lambda e: e["audio_seconds"])
    (out / "index.json").write_text(json.dumps({
        "buckets": index, "text_tokens": text_tokens,
        "sample_rate": sample_rate}, indent=2))
    return out


class ServingModel:
    """Deserialized artifact: `predict(batch)` with zero retracing."""

    def __init__(self, art_dir: str | Path):
        import jax
        from jax import export as jexp
        art = Path(art_dir)
        self.spec = json.loads((art / "spec.json").read_text())
        self._exp = jexp.deserialize((art / "program.bin").read_bytes())
        loaded = np.load(art / "params.npz")
        self._flat_params = {k: loaded[k] for k in loaded.files}
        self._call = jax.jit(self._exp.call)
        self._params_dev = None

    def _params_in_order(self):
        # jax.export flattens (params, batch) by tree order; rebuild the
        # params pytree lazily on first call by walking the explicit
        # skeleton persisted in spec.json (exact structure, no parsing)
        if self._params_dev is None:
            skel = self.spec.get("params_tree")
            if skel is not None:
                self._params_dev = _rebuild_from_skeleton(skel,
                                                          self._flat_params)
            else:  # pre-round-3 artifact: legacy keystr parsing
                self._params_dev = self._params_from_keystrs()
        return self._params_dev

    def _params_from_keystrs(self):
        import jax
        tree = {}
        for key, arr in self._flat_params.items():
            # keystr like "['audio_backbone']['convs'][0]['kernel']"
            parts = [p.strip("'\"") for p in
                     key.replace("]", "").split("[") if p]
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jax.numpy.asarray(arr)
        return _listify(tree)

    def predict(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        import jax.numpy as jnp
        spec = self.spec["batch_spec"]
        dev_batch = {k: jnp.asarray(np.asarray(batch[k], dtype=d))
                     for k, (s, d) in spec.items()}
        outs = self._call(self._params_in_order(), dev_batch)
        return {name: np.asarray(o)
                for name, o in zip(self.spec["outputs"], outs)}


def _listify(node):
    """Convert dicts whose keys are all digit strings back into lists
    (conv stacks are Python lists in the param tree)."""
    if isinstance(node, dict):
        conv = {k: _listify(v) for k, v in node.items()}
        if conv and all(k.isdigit() for k in conv):
            return [conv[str(i)] for i in range(len(conv))]
        return conv
    return node

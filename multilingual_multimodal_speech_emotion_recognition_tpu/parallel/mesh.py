"""Device mesh and sharding rules.

The reference has no distributed layer at all (single cuda/mps/cpu device,
SURVEY.md §5.8); this module is its TPU-native replacement: a
('data', 'model') Mesh over the slice, batch sharded on 'data', parameters
replicated at parity scale (~0.4B params fits per chip in bf16) with 'model'
sharding rules for the large backbone matrices when scaling up. Collectives
(grad psum, eval all_gather) are emitted by jit from these NamedShardings
and ride ICI — no hand-written communication layer.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices=None, data: int = -1, model: int = 1,
              *, dcn_data: int = 1) -> Mesh:
    """Build a ('data','model') mesh. data=-1 uses all remaining devices.

    dcn_data > 1 targets a MULTI-SLICE pod: `data` then counts per-slice
    data shards and the global data axis is dcn_data*data, laid out
    slice-major so the only inter-slice traffic is the once-per-step
    gradient all-reduce segment (pure data parallelism over DCN; tensor
    sharding and the intra-slice gradient segments stay on ICI — the
    standard DCN-outermost recipe). On real multi-slice hardware the
    device order comes from mesh_utils.create_hybrid_device_mesh (which
    reads each device's slice topology); on single-slice or virtual
    (CPU-mesh) devices the slice-major reshape is used directly — the
    SPMD program is identical either way, only physical placement of the
    collective hops differs, so the multi-slice program can be validated
    end-to-end without a pod.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        assert n % (model * dcn_data) == 0
        data = n // (model * dcn_data)
    assert data * model * dcn_data == n, \
        f"dcn {dcn_data} x data {data} x model {model} != {n} devices"
    if dcn_data > 1 and all(getattr(d, "slice_index", None) is not None
                            for d in devices.flat):
        from jax.experimental import mesh_utils
        dm = mesh_utils.create_hybrid_device_mesh(
            (data, model), (dcn_data, 1), devices=list(devices.flat),
            allow_split_physical_axes=True)
        dm = np.asarray(dm).reshape(dcn_data * data, model)
    else:
        dm = devices.reshape(dcn_data * data, model)
    return Mesh(dm, (DATA_AXIS, MODEL_AXIS))


def mesh_from_config(mcfg) -> Mesh:
    """Build the mesh a `MeshConfig` describes (config.py:MeshConfig)."""
    return make_mesh(data=mcfg.data_axis, model=mcfg.model_axis,
                     dcn_data=mcfg.dcn_data)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_spec(batch: dict, mesh: Mesh) -> dict:
    return jax.tree.map(lambda _: NamedSharding(mesh, P(DATA_AXIS)), batch)


def _param_pspec(path: tuple, leaf) -> P:
    """Model-axis sharding rules for the big backbone matrices.

    Large 2-D kernels shard their output dim on 'model'; embeddings shard
    the vocab dim; everything else (norms, biases, small heads) replicates.
    Row/col choices keep each matmul a single all-reduce-free pass followed
    by one psum at layer boundaries (Megatron-style pairing: ffn_in
    column-parallel, ffn_out row-parallel).
    """
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    if leaf.ndim >= 2 and "kernel" in joined:
        if "ffn_in" in joined or joined.endswith("q/kernel") or \
           joined.endswith("k/kernel") or joined.endswith("v/kernel"):
            return P(*([None] * (leaf.ndim - 1)), MODEL_AXIS)  # column parallel
        if "ffn_out" in joined or "out/kernel" in joined:
            return P(*([None] * (leaf.ndim - 2)), MODEL_AXIS, None)  # row parallel
    if leaf.ndim == 2 and ("word" in joined or "position" in joined):
        return P(None, None)
    return P()


#: Leaves smaller than this replicate even under FSDP: gathering a tiny
#: norm/bias costs a collective launch without saving meaningful HBM.
FSDP_MIN_SIZE = 2 ** 15


def _fsdp_pspec(spec: P, leaf, n: int, min_size: int) -> P:
    """ZeRO-style extension of a model-axis spec: shard the largest
    still-unsharded dim divisible by the data-axis size over 'data'.

    XLA/GSPMD turns these layouts into the FSDP communication pattern
    automatically — params all-gather just-in-time per matmul in the
    forward/backward, gradients reduce-scatter, and the optimizer update
    runs on the local shard only (optimizer state created from sharded
    params inherits the same layout, so AdamW moments are sharded too:
    ZeRO-1/2/3 in one set of annotations).
    """
    if leaf.size < max(min_size, 1) or n <= 1:
        return spec
    full = tuple(spec) + (None,) * (leaf.ndim - len(spec))
    best = None
    for d in range(leaf.ndim):
        if full[d] is not None or leaf.shape[d] % n or leaf.shape[d] < n:
            continue
        if best is None or leaf.shape[d] > leaf.shape[best]:
            best = d
    if best is None:
        return spec
    return P(*(DATA_AXIS if d == best else full[d] for d in range(leaf.ndim)))


def param_shardings(params, mesh: Mesh, *, fsdp: bool = False,
                    fsdp_min_size: Optional[int] = None):
    """NamedShardings for a parameter pytree under this mesh. With
    model axis size 1 and fsdp off everything is effectively replicated.

    fsdp=True additionally shards each large leaf over the 'data' axis
    (fully-sharded data parallelism — params + grads + optimizer state all
    live in 1/data_axis of HBM per chip; the reference keeps everything
    resident on its single device, reference src/train.py:100-140)."""
    n_data = mesh.shape.get(DATA_AXIS, 1)
    if fsdp_min_size is None:
        fsdp_min_size = FSDP_MIN_SIZE
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = [_param_pspec(path, leaf) for path, leaf in flat]
    if fsdp:
        specs = [_fsdp_pspec(spec, leaf, n_data, fsdp_min_size)
                 for spec, (path, leaf) in zip(specs, flat)]
    shardings = [NamedSharding(mesh, spec) for spec in specs]
    return jax.tree_util.tree_unflatten(treedef, shardings)


@jax.jit
def _expand_audio(audio_i16, lengths):
    """Device-side reconstruction of (audio f32, prefix mask f32)."""
    audio = audio_i16.astype(jnp.float32) * (1.0 / 32768.0)
    idx = jnp.arange(audio.shape[-1], dtype=jnp.int32)
    mask = (idx[None, :] < lengths[:, None]).astype(jnp.float32)
    return audio, mask


def _compact_audio_host(audio, mask):
    """(int16 audio, int32 lengths) when the wire compression is provably
    lossless, else None: audio must dequantize bit-exactly (true for
    PCM16-decoded sources, the datasets' format) and the mask must be in
    length-prefix form (how the loader builds it)."""
    if not (isinstance(audio, np.ndarray) and audio.dtype == np.float32
            and isinstance(mask, np.ndarray) and audio.ndim == 2):
        return None
    lengths = mask.astype(bool).sum(-1).astype(np.int32)
    idx = np.arange(audio.shape[-1])
    if not ((idx[None, :] < lengths[:, None]) == mask.astype(bool)).all():
        return None
    if audio.size and float(np.abs(audio).max()) > 32767.0 / 32768.0:
        return None
    qi = np.round(audio * 32768.0).astype(np.int16)
    if not np.array_equal(qi.astype(np.float32) * (1.0 / 32768.0), audio):
        return None
    return qi, lengths


def shard_batch(batch: dict, mesh: Mesh, *, compact_audio: bool = True) -> dict:
    """Place a host batch onto the mesh, sharded over 'data'.

    compact_audio: the dominant transfer bytes are `audio` [B, T] f32 plus
    its same-sized f32 prefix mask. When losslessly possible (PCM16-exact
    samples, prefix-form mask — the loader's standard output) they ship as
    int16 samples + int32 lengths (~25% of the bytes) and are reconstructed
    on device, so every consumer still sees the standard f32 keys. Matters
    on any host->device link (PCIe included), and 4x so on slow ones."""
    from . import multihost  # function-level: multihost imports data.pipeline
    s = NamedSharding(mesh, P(DATA_AXIS))
    # single-process this is exactly jax.device_put; on a pod each process
    # contributes its local rows to the global array (multihost.put_sharded)
    put = lambda x: multihost.put_sharded(x, s)
    compact = None
    if compact_audio and isinstance(batch.get("audio"), np.ndarray) \
            and isinstance(batch.get("audio_mask"), np.ndarray):
        compact = _compact_audio_host(batch["audio"], batch["audio_mask"])
    if compact is None:
        return jax.tree.map(put, batch)
    qi, lengths = compact
    rest = {k: put(v) for k, v in batch.items()
            if k not in ("audio", "audio_mask")}
    audio, mask = _expand_audio(put(qi), put(lengths))
    return {**rest, "audio": audio, "audio_mask": mask}


def shard_params(params, mesh: Mesh, *, fsdp: bool = False,
                 fsdp_min_size: Optional[int] = None):
    shardings = param_shardings(params, mesh, fsdp=fsdp,
                                fsdp_min_size=fsdp_min_size)
    return jax.tree.map(jax.device_put, params, shardings)

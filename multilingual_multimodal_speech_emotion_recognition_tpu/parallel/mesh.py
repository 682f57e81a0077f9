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


def make_mesh(devices=None, data: int = -1, model: int = 1) -> Mesh:
    """Build a ('data','model') mesh. data=-1 uses all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        assert n % model == 0
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    return Mesh(devices.reshape(data, model), (DATA_AXIS, MODEL_AXIS))


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


def param_shardings(params, mesh: Mesh):
    """NamedShardings for a parameter pytree under this mesh. With
    model axis size 1 everything is effectively replicated."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = [NamedSharding(mesh, _param_pspec(path, leaf))
                 for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh, sharded over 'data'."""
    s = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), s), batch)


def shard_params(params, mesh: Mesh):
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)

"""Device mesh + sharding helpers.

The reference's only distribution strategy is DDP data parallelism over NCCL
(/root/reference/model_training/config/backend/4gpu.yaml, SURVEY.md §2.10).
The TPU-native equivalent: one ``jax.sharding.Mesh`` with a ``data`` axis over
ICI; the train step is ``jit`` with NamedSharding-annotated inputs, so the
gradient all-reduce, metric reductions, and cross-device batch-norm statistics
are XLA collectives inserted automatically. A ``model`` axis is plumbed
through (default size 1) so the FLAME blendshape matmul and the wide head
layers can be tensor-sharded without API changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Device-put every array leaf of a batch pytree with its leading axis
    sharded over the data axis."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to_devices(batch_size: int, mesh: Mesh) -> int:
    """Smallest batch size >= batch_size divisible by the data-axis size."""
    d = mesh.shape[DATA_AXIS]
    return ((batch_size + d - 1) // d) * d


def local_data_parallel_mesh() -> Mesh:
    """Single-axis data mesh over every addressable device."""
    return make_mesh(model=1)


def head_tp_shardings(tree, mesh: Mesh):
    """NamedSharding tree for a TrainState/params pytree: the wide head Dense
    kernels tensor-sharded over the ``model`` axis, everything else
    replicated (SURVEY.md §2.10 — the head/blendshape matmuls are the natural
    model-axis work).

    Layout: each ``*_head`` MLP is Dense(2048->512) -> Dense(512->out).
      - ``Dense_0/kernel`` (in, 512): output dim over MODEL (column-parallel),
        with the matching bias shard, so the GEMM writes only its local 512/m
        activations;
      - ``Dense_1/kernel`` (512, out): contraction dim over MODEL
        (row-parallel) — XLA inserts the psum that completes the matmul.
    Optimizer moments (same tree structure) shard identically for free."""

    def spec_for(path, x):
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        in_head = any(k.endswith("_head") for k in keys)
        if in_head and "Dense_0" in keys:
            if "kernel" in keys and x.ndim == 2:
                return P(None, MODEL_AXIS)
            if "bias" in keys and x.ndim == 1:
                return P(MODEL_AXIS)
        if in_head and "Dense_1" in keys and "kernel" in keys and x.ndim == 2:
            return P(MODEL_AXIS, None)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, spec_for(p, x)), tree
    )

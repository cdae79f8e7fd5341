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

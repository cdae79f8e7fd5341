"""Device prefetcher: overlap host batch preparation with device compute.

JAX dispatch is asynchronous, so putting batch N+1 on device while the step
for batch N executes hides the host->device transfer entirely (double
buffering). The reference relies on torch DataLoader pinned-memory workers
for the same effect.
"""

from __future__ import annotations

import collections
from typing import Any, Dict, Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import batch_sharding


def put_global_batch(batch: Dict[str, Any], mesh) -> Dict[str, jax.Array]:
    """Place one batch on the mesh with the leading axis sharded over
    ``data``.

    Single-host (every mesh device addressable): a plain sharded device_put
    of the host-global batch. Multi-host: the batch is this process's LOCAL
    shard (``DataLoader`` with process_index/process_count yields exactly the
    rows belonging to this host's devices), and the global jax.Array is
    assembled with ``jax.make_array_from_process_local_data`` — no host ever
    materializes the global batch, matching the reference's per-rank
    DistributedSampler feeding DDP (flame_lightning_model.py:182-186)."""
    sharding = batch_sharding(mesh)
    single_host = sharding.is_fully_addressable
    n_local = len([d for d in mesh.devices.flat if d.process_index == jax.process_index()])
    n_data = mesh.shape["data"]
    # rows of this host's batch must split evenly over its data-axis devices
    divisor = n_data if single_host else max(1, n_local)

    out = {}
    for k, v in batch.items():
        if not isinstance(v, (np.ndarray, jnp.ndarray)):
            continue
        if v.shape[0] % divisor != 0:
            raise ValueError(
                f"batch axis of {k} ({v.shape[0]}) must be divisible by "
                f"{divisor} (local data-axis devices)"
            )
        if single_host:
            out[k] = jax.device_put(jnp.asarray(v), sharding)
        else:
            out[k] = jax.make_array_from_process_local_data(sharding, np.asarray(v))
    return out


def device_prefetch(
    iterator: Iterable[Dict[str, Any]], mesh, size: int = 2
) -> Iterator[Dict[str, jax.Array]]:
    """Yield batches already device_put with the data-axis sharding, keeping
    ``size`` batches in flight."""

    def put(batch):
        return put_global_batch(batch, mesh)

    queue: "collections.deque" = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        yield queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass

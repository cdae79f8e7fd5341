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


def device_prefetch(
    iterator: Iterable[Dict[str, Any]], mesh, size: int = 2
) -> Iterator[Dict[str, jax.Array]]:
    """Yield batches already device_put with the data-axis sharding, keeping
    ``size`` batches in flight."""
    sharding = batch_sharding(mesh)
    n_data = mesh.shape["data"]

    def put(batch):
        out = {}
        for k, v in batch.items():
            if not isinstance(v, (np.ndarray, jnp.ndarray)):
                continue
            if v.shape[0] % n_data != 0:
                raise ValueError(
                    f"batch axis of {k} ({v.shape[0]}) must be divisible by "
                    f"the data-mesh axis ({n_data} devices)"
                )
            out[k] = jax.device_put(jnp.asarray(v), sharding)
        return out

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

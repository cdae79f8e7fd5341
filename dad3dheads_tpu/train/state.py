"""TrainState: one pytree carrying everything a training step mutates.

Replaces the reference's scattered Lightning state (module params, BN running
stats, optimizer state, global step/epoch counters) with a single
jit-donatable, orbax-serializable, NamedSharding-annotatable pytree.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array  # global optimizer step
    epoch: jax.Array  # current epoch (drives loss schedules)

    @classmethod
    def create(cls, params, batch_stats, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            epoch=jnp.zeros((), jnp.int32),
        )

    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


def init_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    input_shape=(1, 256, 256, 3),
    dtype=jnp.float32,
) -> TrainState:
    """Initialize model variables under jit (eager init is pathologically slow
    over a remote TPU tunnel) and wrap them in a TrainState."""

    @jax.jit
    def _init(rng):
        variables = model.init(rng, jnp.zeros(input_shape, dtype), train=False)
        return variables

    variables = _init(rng)
    return TrainState.create(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        tx=tx,
    )

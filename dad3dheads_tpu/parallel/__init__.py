from .prefetch import device_prefetch
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    local_data_parallel_mesh,
    make_mesh,
    pad_batch_to_devices,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "pad_batch_to_devices",
    "local_data_parallel_mesh",
    "device_prefetch",
]

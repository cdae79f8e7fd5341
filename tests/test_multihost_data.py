"""Multi-host data parallelism: per-process dataset sharding in the
DataLoader (reference: DistributedSampler,
/root/reference/model_training/train/flame_lightning_model.py:182-186) and
host-local -> global jax.Array assembly in the prefetch path.

True multi-process JAX cannot run in one test process; these tests verify
the two halves of the contract separately on the 8-device CPU mesh:
  1. N DataLoaders with ranks 0..N-1 partition every epoch exactly;
  2. assembling per-device shards yields the same global array layout that
     ``put_global_batch`` produces from the host-global batch.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dad3dheads_tpu.constants import SAMPLE_INDEX_KEY
from dad3dheads_tpu.data.dataset import DataLoader
from dad3dheads_tpu.parallel.mesh import batch_sharding, make_mesh
from dad3dheads_tpu.parallel.prefetch import device_prefetch, put_global_batch


class StubDataset:
    def __init__(self, n: int):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int):
        return {SAMPLE_INDEX_KEY: int(idx), "x": np.full((3,), idx, np.float32)}


def _epoch_indices(loader):
    return [[int(i) for i in b[SAMPLE_INDEX_KEY]] for b in loader]


def test_loader_partitions_across_processes():
    n, global_bs, world = 37, 8, 4
    loaders = [
        DataLoader(
            StubDataset(n), global_bs, shuffle=True, num_workers=1, seed=42,
            process_index=r, process_count=world,
        )
        for r in range(world)
    ]
    assert all(lo.local_batch_size == global_bs // world for lo in loaders)

    epochs = [[_epoch_indices(lo) for lo in loaders] for _ in range(2)]
    for per_rank in epochs:
        counts = [len(b) for b in per_rank]
        assert len(set(counts)) == 1 and counts[0] == len(loaders[0])
        flat = [i for rank in per_rank for batch in rank for i in batch]
        assert len(flat) == len(set(flat)), "ranks overlap"
        assert set(flat) <= set(range(n))
    # shuffling advances identically on every rank: epoch 2 differs from 1
    assert epochs[0] != epochs[1]


def test_loader_single_process_unchanged():
    lo = DataLoader(StubDataset(20), 8, shuffle=False, num_workers=1,
                    process_index=0, process_count=1)
    idxs = _epoch_indices(lo)
    assert idxs == [list(range(0, 8)), list(range(8, 16))]


def test_put_global_batch_shards_data_axis():
    mesh = make_mesh()
    n = mesh.shape["data"]
    batch = {"x": np.arange(n * 2 * 5, dtype=np.float32).reshape(n * 2, 5),
             "name": ["a"] * (n * 2)}
    out = put_global_batch(batch, mesh)
    assert set(out) == {"x"}
    assert out["x"].sharding.is_equivalent_to(batch_sharding(mesh), 2)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])


def test_local_shard_assembly_matches_global_put():
    """The layout the multi-host path must produce: assembling one shard per
    device (each host contributes only its rows, as
    make_array_from_process_local_data does) equals the sharded device_put of
    the host-global batch."""
    mesh = make_mesh()
    devices = list(mesh.devices.flat)
    n = len(devices)
    sharding = batch_sharding(mesh)
    global_np = np.arange(n * 3 * 4, dtype=np.float32).reshape(n * 3, 4)

    rows_per_dev = global_np.shape[0] // n
    shards = [
        jax.device_put(global_np[i * rows_per_dev : (i + 1) * rows_per_dev], d)
        for i, d in enumerate(devices)
    ]
    assembled = jax.make_array_from_single_device_arrays(
        global_np.shape, sharding, shards
    )
    direct = put_global_batch({"x": global_np}, mesh)["x"]
    np.testing.assert_array_equal(np.asarray(assembled), np.asarray(direct))
    assert assembled.sharding.is_equivalent_to(direct.sharding, 2)


def test_device_prefetch_keeps_batches_in_flight():
    mesh = make_mesh()
    n = mesh.shape["data"]
    batches = [{"x": np.full((n, 2), i, np.float32)} for i in range(5)]
    seen = [np.asarray(b["x"])[0, 0] for b in device_prefetch(iter(batches), mesh)]
    assert seen == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_local_data_row_count_with_model_axis():
    """With a model axis >1 the multi-host batch divisor is the number of
    data-axis rows this process owns, NOT its device count — model columns
    replicate the batch shard (round-2 review fix)."""
    from dad3dheads_tpu.parallel.prefetch import local_data_row_count

    mesh = make_mesh(model=2)  # 8 CPU devices -> (data=4, model=2)
    assert mesh.shape["data"] == 4
    n_local_devices = sum(
        1 for d in mesh.devices.flat if d.process_index == jax.process_index()
    )
    assert n_local_devices == 8
    assert local_data_row_count(mesh) == 4
    # a process owning no devices of this mesh contributes at least divisor 1
    assert local_data_row_count(mesh, process_index=10**6) == 1
